.PHONY: native test bench clean

native:
	python -c "from slamrs_tpu.native import build; print(build(force=True))"

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f slamrs_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
