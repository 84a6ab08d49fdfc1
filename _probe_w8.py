import os, time, json
import numpy as np
import jax, jax.numpy as jnp
from smalltts_tpu.infer.pipeline import SmallTTS, enable_compilation_cache
enable_compilation_cache(os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))

def measure(w8):
    tts = SmallTTS(seed=0, w8_modulation=w8)
    b, r, p, t_bucket = 8, 64, 128, 40
    rng = np.random.RandomState(0)
    args = (rng.randn(b, r, 64).astype(np.float32), np.full(b, r),
            rng.randint(1, 190, (b, p)).astype(np.int32), np.full(b, 100),
            np.full(b, 38), t_bucket)
    key = jax.random.PRNGKey(1)
    out = tts.synthesize_padded(*args, key=key)  # compile+warm
    # sustained dispatch rate (chained, fetch=False), the PERF.md method
    N = 30
    t0 = time.perf_counter()
    last = None
    for i in range(N):
        last = tts.synthesize_padded(*args, key=key, fetch=False)
    np.asarray(last)
    dt = (time.perf_counter() - t0) / N * 1e3
    return dt, out

for w8 in (False, True):
    dt, out = measure(w8)
    print(json.dumps({"w8_modulation": w8, "ms_per_call": round(dt, 2),
                      "rtf": round(dt/1e3/5.0/8*8, 6) if False else round(dt/1e3/(5.0), 6)}))
    if w8:
        # parity vs fp at full size (random init, nonzero? velocity zero-init...)
        pass
