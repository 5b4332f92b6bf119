.PHONY: test test-fast demo run bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

demo:
	python demo/demo.py

run:
	python -m super_rag_tpu.app

bench:
	python bench.py

bench-ivf:      # IVF latency tier + nprobe recall/latency curve
	python scripts/bench_ivf.py

bench-10m:      # 10M-row single-chip capacity + recall
	python scripts/bench_10m.py

bench-ingest:   # docs/s through the engine write path
	python scripts/bench_ingest.py

bench-fidelity: # hybrid fidelity vs QPS over the postings cap
	python scripts/tune_fidelity.py

native:
	mkdir -p super_rag_tpu/native/build
	g++ -O3 -std=c++17 -shared -fPIC super_rag_tpu/native/analyzer.cpp \
	  -o super_rag_tpu/native/build/libanalyzer.so
	g++ -O3 -std=c++17 -shared -fPIC super_rag_tpu/native/postings.cpp \
	  -o super_rag_tpu/native/build/libpostings.so

clean:
	rm -rf super_rag_tpu/native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
