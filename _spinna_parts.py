import os, sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from picasso_tpu import spinna
from picasso_tpu.ops.neighbors import knn_masked, ks_2samp_masked

def _dimer(dist=20.0):
    s = spinna.Structure("dimer"); s.define_coordinates("A", [-dist/2, dist/2], [0.0,0.0], [0.0,0.0]); return s
def _monomer():
    s = spinna.Structure("monomer"); s.define_coordinates("A", [0.0],[0.0],[0.0]); return s
mixer = spinna.StructureMixer([_monomer(), _dimer()], label_unc={"A": 2.0}, le={"A": 0.9},
                              width=8000.0, height=8000.0)
np.random.seed(0)
gt = mixer.run_simulation([1500, 1250])
sp = spinna.SPINNA(mixer, gt, N_sim=4)
N = np.array([[a*80, b*70] for a in range(33) for b in range(33)])
scorer = sp._get_batched_scorer(N)
print("chunk:", scorer.chunk, "P:", scorer.P, "pairs:", scorer.pair_keys, flush=True)
B = scorer.chunk
n_sim = scorer.N_sim
B2 = B * n_sim
counts = jnp.asarray(np.tile(N[500], (B, 1)).astype(np.int32))
key = jax.random.PRNGKey(0)

# (a) simulation+compaction only
def sim_only(counts, key):
    keys = jax.random.split(key, scorer.n_structures)
    counts2 = jnp.repeat(counts, n_sim, axis=0)
    acc = 0.0
    per_target = {t: [] for t in scorer.targets}
    for si in range(scorer.n_structures):
        simd = scorer._simulate_structure(si, counts2[:, si], keys[si])
        for t, cm in simd.items():
            per_target[t].append(cm)
    for ti, t in enumerate(scorer.targets):
        parts = per_target[t]
        c = jnp.concatenate([c for c, _ in parts], axis=1)[..., :2]
        m = jnp.concatenate([m for _, m in parts], axis=1)
        p_out = scorer.P[ti]
        if c.shape[1] > p_out:
            order = jnp.argsort(~m, axis=1, stable=True)[:, :p_out]
            c = jnp.take_along_axis(c, order[:, :, None], axis=1)
            m = jnp.take_along_axis(m, order, axis=1)
        acc = acc + jnp.sum(c) * 1e-9 + jnp.sum(m)
    return acc
sim_jit = jax.jit(sim_only)

# (b) knn only at the real pair shapes
P = scorer.P[0]
rng = np.random.default_rng(1)
c1 = jnp.asarray(rng.uniform(0, 8000, (B2, P, 2)).astype(np.float32))
m1 = jnp.asarray(rng.random((B2, P)) < 0.45)
n_k = scorer.pair_keys[0][2]
blk = 512
def knn_only(c1):
    d = jax.vmap(lambda a, am: knn_masked(a, a, am, am, n_k, exclude_self=True, b_block=blk))(c1, m1)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)) * 1e-9
knn_jit = jax.jit(knn_only)

# (c) ks only
S = n_sim * P
sample = jnp.asarray(rng.uniform(0, 100, (B, S)).astype(np.float32))
smask = jnp.asarray(rng.random((B, S)) < 0.45)
gt_sorted = jnp.asarray(np.sort(rng.uniform(0, 100, 2700)).astype(np.float32))
def ks_only(sample):
    st = jax.vmap(lambda s, mm: ks_2samp_masked(s, mm, gt_sorted))(sample, smask)
    return jnp.sum(st)
ks_jit = jax.jit(ks_only)

def timed(f, *a):
    t0=time.perf_counter(); float(f(*a)); tw=time.perf_counter()-t0
    t0=time.perf_counter(); float(f(*a)); tr=time.perf_counter()-t0
    return tw, tr

for name, f, a in (("sim", sim_jit, (counts, key)), ("knn", knn_jit, (c1,)), ("ks", ks_jit, (sample,))):
    tw, tr = timed(f, *a)
    print(f"{name}: compile+1st {tw:.1f}s steady {tr*1e3:.0f} ms/chunk  (x57 chunks = {tr*57:.1f}s)", flush=True)
