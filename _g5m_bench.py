import os, sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import pandas as pd
from picasso_tpu import g5m as g5m_mod

rng = np.random.default_rng(0)
rows = []
for c in range(500):
    n_blobs = rng.integers(1, 5)
    cx, cy = rng.uniform(5, 250, 2)
    for b in range(n_blobs):
        mx, my = cx + rng.normal(0, 0.12, 2)
        n = int(rng.integers(40, 150))
        rows.append(np.column_stack([
            rng.normal(mx, 0.02, n), rng.normal(my, 0.02, n),
            np.full(n, 0.01), np.full(n, 0.01), np.full(n, c)]))
arr = np.concatenate(rows)
locs = pd.DataFrame({"x": arr[:,0].astype(np.float32), "y": arr[:,1].astype(np.float32),
                     "lpx": arr[:,2].astype(np.float32), "lpy": arr[:,3].astype(np.float32),
                     "group": arr[:,4].astype(np.int32),
                     "frame": rng.integers(0, 5000, len(arr)).astype(np.uint32),
                     "photons": np.full(len(arr), 1000, np.float32)})
info = [{"Width": 256, "Height": 256, "Pixelsize": 130, "Frames": 5000}]
print("locs:", len(locs), "clusters:", locs.group.nunique(), flush=True)

t0 = time.perf_counter()
centers, clustered, out_info = g5m_mod.g5m(locs, info, min_locs=20)
t_b = time.perf_counter() - t0
print(f"batched: {t_b:.1f}s for 500 clusters ({500/t_b:.1f}/s), centers={len(centers)}", flush=True)

os.environ["PICASSO_TPU_G5M"] = "host"
sub = locs[locs.group < 50]
t0 = time.perf_counter()
c2, _, _ = g5m_mod.g5m(sub, info, min_locs=20)
t_s = (time.perf_counter() - t0) * 10
print(f"serial (extrap from 50): {t_s:.1f}s -> speedup {t_s/t_b:.1f}x", flush=True)
