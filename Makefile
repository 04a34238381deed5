# Top-level targets (analog of the reference's Makefile glue).

.PHONY: all native test test-quick lint bench tpu-smoke docs clean

all: native

native:
	$(MAKE) -C biseqt_tpu/native

test: native
	python -m pytest tests/ -x -q

# inner-loop suite (~6 min): skips the interpret-mode row-kernel sweeps
test-quick: native
	python -m pytest tests/ -x -q -m "not slow"

# no flake8/pyflakes in this environment: compile-check every source file
# (catches syntax errors and is a real failure, not a no-op)
lint:
	python -m compileall -q biseqt_tpu tests experiments bench.py \
	  __graft_entry__.py

bench:
	python bench.py

# serialized real-chip regression: kernel-vs-lax scores (all modes), dirs
# traceback parity, sorted all-vs-all sanity, quick throughput — one
# command, JSON summary (protects against silent hardware regressions;
# the main suite runs CPU-forced)
tpu-smoke: native
	python experiments/tpu_smoke.py

# API reference: sphinx if installed (the reference's doc stack),
# otherwise the stdlib docstring->markdown generator
docs:
	@python -c "import sphinx" 2>/dev/null \
	  && sphinx-build -b html docs docs/_build \
	  || python docs/gen_api.py

clean:
	$(MAKE) -C biseqt_tpu/native clean
	rm -rf .pytest_cache .jax_cache __pycache__
