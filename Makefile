.PHONY: native test bench longrun clean

native:
	python -c "from slamrs_tpu.native import build; print(build(force=True))"

test:
	python -m pytest tests/ -q

# long-horizon gates (full out.bin oracle parity + 500-update fused-vs-dda
# deviation); several minutes — not part of the default suite
longrun:
	SLAMRS_LONGRUN=1 python -m pytest tests/test_longrun.py -q -s

bench:
	python bench.py

clean:
	rm -f slamrs_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
