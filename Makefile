# Convenience targets — RESULTS.md's tables are regenerated from these
# scripts (each section header in RESULTS.md names its script). The
# `results` target keeps the tables honest as the code moves
# (VERDICT r2 weak item 6).

.PHONY: test tpu-lane results results-cpu bench dryrun

test:
	python -m pytest tests/ -q

# Real-chip hardware lane (needs the TPU tunnel; minutes of remote compile
# on a cold cache).
tpu-lane:
	LSBENCH_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

# CPU-only tables (RESULTS.md §1 — AMG cycle factors; §7 — scaling
# evidence: sim sweep + comm volumes + ICI model).
results-cpu:
	python _results_amg.py | tee _results_amg.out
	python _results_scale_sweep.py | tee _results_scale_sweep.out

# Full measurement refresh (TPU rig; hours on a cold compile cache).
# _results_cli / _results_prod checkpoint to .jsonl and resume.
results: results-cpu
	python _results_cli.py
	python _results_prod.py
	python _results_dist_hw.py | tee _results_dist_hw.jsonl
	python _results_scale.py | tee _results_scale.out
	python _results_spchol.py | tee _results_spchol.jsonl

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	  "import jax; jax.config.update('jax_platforms','cpu'); \
	   import __graft_entry__ as g; g.dryrun_multichip(8); print('ok')"
