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

baselines:
	python scripts/integration_baselines.py --methods ewc,scrub,lwf,lirf
	python scripts/integration_baselines.py --unsaturated \
	    --methods gs_lora,ewc,scrub,lwf,lirf,der,fdr

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
