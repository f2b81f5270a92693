.PHONY: test bench dryrun serve demo

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

serve:
	python -m s2s_tpu.cli serve

demo:
	python demo/server.py
