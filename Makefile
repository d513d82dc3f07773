# Convenience targets (the reference ships a Makefile for docker workflows; here the
# targets map to the local dev loop).

.PHONY: test test-fast bench bench-suite train-smax

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not integration"

bench:
	python bench.py

bench-suite:
	python scripts/bench_suite.py

train-smax:
	python -m mava_tpu.systems.ppo.rec_ippo env=smax env/scenario=3s5z network=rnn \
	    arch.num_envs=64 system.recurrent_chunk_size=16
