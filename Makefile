# Developer entry points (see CLAUDE.md for environment notes)

.PHONY: test test-fast bench gifs native eval viewer clean

test:            ## full suite (CPU, 8 virtual devices)
	python -m pytest tests/ -q

test-fast:       ## fast tier: heavyweights carry @pytest.mark.slow (~90-110s warm)
	python -m pytest tests/ -q -m "not slow"

bench:           ## flagship benchmark on the TPU (env: RMP_BENCH_*)
	python bench.py

eval:            ## domain-randomized success-rate sweep
	python experiments/evaluate.py

viewer:          ## live interactive viewer (browser; --cpu for local)
	python experiments/viewer.py franka/06_cluttered_environment --cpu

gifs:            ## demo GIFs (CPU)
	python experiments/make_gifs.py franka/06_cluttered_environment --cpu

native:          ## build the C++ renderer
	$(MAKE) -C native

clean:
	rm -rf .jax_cache native/libtinyrender.so
	find . -name __pycache__ -type d -exec rm -rf {} +
