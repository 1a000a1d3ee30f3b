import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from drba_tpu.ops.conv_chain import ChainStep, conv_chain
sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0,1,(3,544,960,64)), jnp.bfloat16)
def mk(pre):
    return [ChainStep(w=jnp.asarray(rng.normal(0,.1,(3,3,64,64)),jnp.float32),
                      b=jnp.asarray(rng.normal(0,.5,(64,)),jnp.float32),
                      pre_alpha=jnp.float32(0.25) if pre else None) for _ in range(2)]
def timeit(name, fn, *a, n=8):
    t0 = time.perf_counter(); out = fn(*a); float(sync(out))
    print(f"{name:34s} compile {time.perf_counter()-t0:6.1f}s", end=" ", flush=True)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*a)
    float(sync(out)); print(f"run {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
for res, pre in (("input", True), ("none", False)):
    for hb in (32, 34, 68):
        try:
            timeit(f"2step res={res} pre={pre} hb={hb}",
                   jax.jit(functools.partial(conv_chain, residual=res, hb=hb)), x, mk(pre))
        except Exception as e:
            print(f"FAILED: {str(e)[:150]}", flush=True)
