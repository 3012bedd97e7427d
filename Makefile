# One-command test targets (the supported way to run the suite).
#
# `make test` = fast suite; `make test-slow` = compile-heavy trainer/e2e
# suite in per-file shards (see below); `make test-all` = both.
#
# SHARDING: a 1-core host cannot run the whole slow suite inside one
# 10-minute window, so it is split into per-file shards, each sized to
# finish well under 10 minutes cold on a 1-core host (timings recorded in
# TESTLOG.md). Run all shards: `make test-slow`. Run one: `make slow-N`.
# Each shard runs in its own process, which also sidesteps a jax
# persistent-cache serializer segfault after ~40 compile-heavy tests in
# one process (put_executable_and_time, see pytest.ini).

PYTEST ?= python -m pytest

SLOW_SHARDS = slow-1 slow-2 slow-3a slow-3b slow-4 slow-5 slow-6 slow-7 slow-8 slow-9

.PHONY: test test-slow test-all bench dryrun $(SLOW_SHARDS)

test:
	$(PYTEST) tests/ -q -m "not slow"

# Shards ordered longest-first; expected cold durations in TESTLOG.md.
slow-1:
	$(PYTEST) tests/test_batch_semantics.py -q -m slow
slow-2:
	$(PYTEST) tests/test_cyclegan.py -q -m slow
# test_pipeline split in two: both halves re-pay the session-scoped
# micro-pipeline fixture, but each stays under the 10-min window
slow-3a:
	$(PYTEST) tests/test_pipeline.py -q -m slow -k "test_step"
slow-3b:
	$(PYTEST) tests/test_pipeline.py -q -m slow -k "not test_step"
slow-4:
	$(PYTEST) tests/test_resume.py -q -m slow
slow-5:
	$(PYTEST) tests/test_unet_train.py -q -m slow
slow-6:
	$(PYTEST) tests/test_wgan.py -q -m slow
slow-7:
	$(PYTEST) tests/test_classifier.py -q -m slow
slow-8:
	$(PYTEST) tests/test_classify.py -q -m slow
slow-9:
	$(PYTEST) tests/test_export.py -q -m slow

test-slow: $(SLOW_SHARDS)

test-all: test test-slow

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
