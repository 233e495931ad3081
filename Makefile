# CI-style entry points. The close-out contract (CLAUDE.md "keep green"):
# run `make test` after the LAST commit of a session and log the result in
# DEVNOTES.md. Full suite is ~25-30 min on this 1-core host (the mesh
# modules run hermetically in subprocesses — tests/conftest.py) and must
# run UNCONTENDED: never alongside another python/TPU process.

.PHONY: test gates bench native clean

test:
	python -m pytest tests/ -q

# driver contract: entry() compile-check (real TPU) + multichip dryrun (CPU)
gates:
	python __graft_entry__.py
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

# headline JSON line on the real TPU (one TPU process at a time!)
bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
