# Top-level targets (analog of the reference's Makefile glue).

.PHONY: all native test lint bench clean

all: native

native:
	$(MAKE) -C biseqt_tpu/native

test: native
	python -m pytest tests/ -x -q

lint:
	python -m pyflakes biseqt_tpu tests 2>/dev/null || \
	python -m flake8 --select=F biseqt_tpu tests 2>/dev/null || true

bench:
	python bench.py

clean:
	$(MAKE) -C biseqt_tpu/native clean
	rm -rf .pytest_cache .jax_cache __pycache__
