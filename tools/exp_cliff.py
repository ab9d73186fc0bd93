"""Test the time-cliff theory: bench a trivial program every 5s for 4 min.
In the slow regime, also measure chained-dispatch amortization and a
second executable, to learn the real cost model."""

import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("devices:", jax.devices(), f"+{time.perf_counter()-t0:.1f}s", flush=True)

x = jnp.zeros((128,))
triv = jax.jit(lambda x: x * 2.0 + 1.0)
triv2 = jax.jit(lambda x: x * 3.0 - 1.0)
big = jnp.zeros((512, 512))
matmul = jax.jit(lambda a: a @ a)
triv(x).block_until_ready()
triv2(x).block_until_ready()
matmul(big).block_until_ready()
print(f"compiled +{time.perf_counter()-t0:.1f}s", flush=True)


def mn(fn, n=10):
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t1)
    return min(ts), sorted(ts)[n // 2]


def chain(k):
    y = x
    for _ in range(k):
        y = triv(y)
    y.block_until_ready()


end = time.perf_counter() + 240
while time.perf_counter() < end:
    a_min, a_med = mn(lambda: triv(x).block_until_ready())
    b_min, b_med = mn(lambda: chain(10), n=5)
    c_min, c_med = mn(lambda: matmul(big).block_until_ready(), n=5)
    print(f"t={time.perf_counter()-t0:6.1f}s triv min/med "
          f"{a_min*1e3:7.3f}/{a_med*1e3:7.3f}  chain10 {b_min*1e3:7.3f}/"
          f"{b_med*1e3:7.3f}  mm512 {c_min*1e3:7.3f}/{c_med*1e3:7.3f} ms",
          flush=True)
    time.sleep(5)
