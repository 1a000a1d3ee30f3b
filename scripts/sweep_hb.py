import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from drba_tpu.ops.conv_chain import ChainStep, conv_chain
sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0,1,(3,544,960,64)), jnp.bfloat16)
steps = [ChainStep(w=jnp.asarray(rng.normal(0,.1,(3,3,64,64)),jnp.float32),
                   b=jnp.asarray(rng.normal(0,.5,(64,)),jnp.float32),
                   pre_alpha=jnp.float32(0.25)) for _ in range(2)]
hbs = [int(a) for a in sys.argv[1:]] or [32]
for hb in hbs:
    t0 = time.perf_counter()
    try:
        fn = jax.jit(functools.partial(conv_chain, residual="input", hb=hb))
        out = fn(x, steps); float(sync(out))
        print(f"hb={hb} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(6): out = fn(x, steps)
        float(sync(out))
        print(f"hb={hb}: {(time.perf_counter()-t0)/6*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"hb={hb} FAILED: {str(e)[:150]}", flush=True)
