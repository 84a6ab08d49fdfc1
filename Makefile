.PHONY: test test-slow bench native serve certify clean

# real-asset certification: fetch assets, run every parity stage, write
# CERTIFY.json (see scripts/certify.py; each stage smoke-tested in
# tests/test_certify.py)
certify:
	python scripts/certify.py

test:
	python -m pytest tests/ -x -q

test-slow:
	RUN_SLOW=1 python -m pytest tests/ -x -q

bench:
	python bench.py

bench-full:
	BENCH_FULL=1 python bench.py

native:
	$(MAKE) -C smalltts_tpu/native

serve:
	python -m smalltts_tpu.serving.server --port 3000

clean:
	$(MAKE) -C smalltts_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
