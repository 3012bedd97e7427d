# One-command test targets (the supported way to run the suite).
#
# `make test` = fast suite; `make test-slow` = compile-heavy trainer/e2e
# suite in per-file xdist workers (a single long process can segfault the
# jax persistent-cache serializer after ~40 compile-heavy tests — worker
# isolation sidesteps it, see pytest.ini); `make test-all` = both.

PYTEST ?= python -m pytest

.PHONY: test test-slow test-all bench dryrun

test:
	$(PYTEST) tests/ -q -m "not slow"

test-slow:
	$(PYTEST) tests/ -q -m slow -n 4 --dist loadfile

test-all: test test-slow

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
