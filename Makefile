# Convenience targets.  TPU targets claim the (single) chip exclusively.

test:            ## CPU test suite (8 virtual devices, no chip claim)
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

bench:           ## headline benchmark on the TPU (one JSON line)
	python bench.py

validate:        ## on-chip parity + PRNG + latency sweep
	python tools/tpu_validate.py

track:           ## full reference-config tracking run with figures
	python -m mppi_robotarm_tpu.cli --steps 1315 --backend pallas \
	    --out-dir results/ --figures

.PHONY: test bench validate track
