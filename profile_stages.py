"""Per-stage timing harness (dev tool, not shipped)."""
import time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from cuda_surf_tpu import SurfConfig
from cuda_surf_tpu.io import read_pgm
from cuda_surf_tpu.ops.integral import integral_image
from cuda_surf_tpu.ops.hessian import response_pyramid
from cuda_surf_tpu.ops.extrema import detect_octave
from cuda_surf_tpu.ops.descriptor import describe
from cuda_surf_tpu.frontend import detect_and_compute
from cuda_surf_tpu.types import compact

cfg = SurfConfig(noctaves=4, thresh=4.0, upright=True, max_pts=4096,
                 candidates_per_octave=4096)
img = jnp.asarray(read_pgm("/root/reference/data/left.pgm"))
h, w = img.shape
sched = cfg.hessian_schedule(h, w)

def bench(name, f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{name:24s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms")
    return r

f_ii = jax.jit(lambda im: integral_image(im, cfg.doubled))
ii = bench("integral", f_ii, img)

f_pyr = jax.jit(lambda ii: response_pyramid(ii, cfg, h, w))
pyr = bench("pyramid", f_pyr, ii)

f_det = jax.jit(lambda pyr: [detect_octave(pyr[o], sched[o], cfg)
                             for o in range(cfg.noctaves)])
cands = bench("detect(all octaves)", f_det, pyr)

def compact_all(cands):
    cat = {k: jnp.concatenate([c[k] for c in cands])
           for k in ("valid", "nx", "ny", "ns", "strength")}
    return compact(cat["valid"], cfg.max_pts, cat["nx"], cat["ny"],
                   cat["ns"], cat["strength"])
f_cmp = jax.jit(compact_all)
count, valid, nx, ny, ns, strength = bench("compact", f_cmp, cands)
print("  count:", int(count))

td = jnp.float32(cfg.sampling * cfg.divisor)
x, y = nx * td, ny * td
scale = jnp.float32(1.2) * ns * jnp.float32(cfg.divisor)
ori = jnp.zeros_like(x)
f_desc = jax.jit(lambda *a: describe(ii, cfg, *a))
bench("describe", f_desc, x, y, scale, ori, valid, n=5)

f_all = jax.jit(lambda im: detect_and_compute(im, cfg))
bench("full detect_and_compute", f_all, img, n=5)
