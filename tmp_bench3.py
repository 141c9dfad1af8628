import sys
sys.argv = ["bench"]
import bench
v3 = bench.bench_grid_slam(particles=1024, width=50.0, resolution=0.05,
                           grid_dtype="bfloat16", n1=10, n2=110)
print("config3:", round(v3, 1), "ticks/s", flush=True)
v2 = bench.bench_grid_slam(resolution=0.02, grid_dtype="bfloat16", n2=1050)
print("0.02m:", round(v2, 1), "ticks/s", flush=True)
v1 = bench.bench_grid_slam()
print("headline 0.05m:", round(v1, 1), "ticks/s", flush=True)
