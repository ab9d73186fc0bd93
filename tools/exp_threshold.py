"""Find the captured-literal size threshold that triggers the axon
slow mode. Escalate: scalar, [2], [4], [16], [64], [256], [31x31]."""

import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
x = jnp.zeros((1024,))
triv = jax.jit(lambda x: x * 2.0 + 1.0)
triv(x).block_until_ready()


def med(fn, n=8):
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t1)
    return sorted(ts)[n // 2] * 1e3


print(f"trivial: {med(lambda: triv(x).block_until_ready()):7.3f} ms", flush=True)

rng = np.random.RandomState(0)
for size in (1, 2, 4, 16, 64, 256, 961):
    C = rng.rand(size).astype(np.float32)

    def mk(C):
        @jax.jit
        def f(x):
            return x[: C.shape[0]] * C

        return f

    f = mk(C)
    jax.block_until_ready(f(x))
    t_prog = med(lambda: jax.block_until_ready(f(x)))
    t_triv = med(lambda: triv(x).block_until_ready())
    print(f"literal[{size:4d}]: prog {t_prog:7.3f} ms | trivial now {t_triv:7.3f} ms",
          flush=True)
    if t_triv > 5.0:
        print("POISONED at size", size, flush=True)
        break
