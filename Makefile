# Developer entry points for ukbb_cardiac_tpu.

PYTHON ?= python

.PHONY: test test-fast bench bench-strain bench-train bench-accuracy native clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not training and not trainer and not two_phase and not demo and not tf_parity and not full_chain and not oracle and not verify_checkpoint and not cohort and not reference_scheme"

bench:
	$(PYTHON) bench.py

bench-strain:
	$(PYTHON) bench_strain.py

bench-train:
	$(PYTHON) bench_train.py

# train-from-scratch accuracy capstone (SA FCN + aortic UNet-LSTM)
bench-accuracy:
	$(PYTHON) bench_accuracy.py --model both

native:
	g++ -O3 -shared -fPIC \
	    ukbb_cardiac_tpu/native/hostops.cc \
	    -o ukbb_cardiac_tpu/native/libhostops.so

clean:
	rm -rf .pytest_cache .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
	rm -f ukbb_cardiac_tpu/native/libhostops.so
