# Developer entry points (VERDICT round-2 item 6: executable static
# analysis wired together with the tests in one target).

PY ?= python

.PHONY: check lint test test-all bench

check: lint test

lint:
	$(PY) -m compileall -q p_div_gnn_tpu tests scripts tools bench.py __graft_entry__.py
	$(PY) tools/lint.py

# Default target fits one CI/driver budget (<5 min): the expensive
# end-to-end/parity tests are marked `slow` and run via test-all.
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
