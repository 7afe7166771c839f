# Developer entry points (VERDICT round-2 item 6: executable static
# analysis wired together with the tests in one target).

PY ?= python

.PHONY: check lint test bench

check: lint test

lint:
	$(PY) -m compileall -q p_div_gnn_tpu tests scripts tools bench.py __graft_entry__.py
	$(PY) tools/lint.py

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
