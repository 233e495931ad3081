.PHONY: test bench native integration clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

integration:
	python scripts/integration_synthetic.py
	python scripts/integration_continual.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
