"""Characterize the ~25ms per-call floor that appears after several
distinct programs have been loaded on the axon TPU backend.

Questions:
 1. Does a single program stay fast when called repeatedly, even after
    many other programs were loaded? (LRU executable cache?)
 2. What's the capacity threshold (number of distinct executables)?
 3. Is the cost per-dispatch or per-sync? (dispatch 20, block once)
 4. Does program SIZE matter?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def t_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def make_prog(i):
    c = float(i)

    @jax.jit
    def f(x):
        return x * c + jnp.sin(x) * (c + 1.0)

    return f


def main():
    print("devices:", jax.devices())
    x = jnp.zeros((128,))

    progs = [make_prog(i) for i in range(24)]

    # compile all sequentially, report each compile-then-2-runs
    print("\n-- load phase: compile + 3 runs each, report run times")
    for i, f in enumerate(progs):
        f(x).block_until_ready()  # compile
        ts = [t_once(lambda: f(x).block_until_ready()) for _ in range(3)]
        print(f"prog {i:2d}: {' '.join(f'{t*1e3:7.2f}' for t in ts)} ms")

    # now re-run prog 0 repeatedly: does it recover?
    print("\n-- prog 0 repeated x10 after 24 programs loaded")
    ts = [t_once(lambda: progs[0](x).block_until_ready()) for _ in range(10)]
    print(" ".join(f"{t*1e3:6.2f}" for t in ts))

    print("\n-- prog 23 repeated x10")
    ts = [t_once(lambda: progs[23](x).block_until_ready()) for _ in range(10)]
    print(" ".join(f"{t*1e3:6.2f}" for t in ts))

    # round robin over 2 programs
    print("\n-- round robin progs 0,1 x6 each")
    for k in range(6):
        a = t_once(lambda: progs[0](x).block_until_ready())
        b = t_once(lambda: progs[1](x).block_until_ready())
        print(f"p0 {a*1e3:6.2f}  p1 {b*1e3:6.2f}")

    # round robin over 8
    print("\n-- round robin progs 0..7, 3 sweeps")
    for k in range(3):
        ts = [t_once(lambda f=f: f(x).block_until_ready()) for f in progs[:8]]
        print(" ".join(f"{t*1e3:6.2f}" for t in ts))

    # dispatch 20 without blocking, then block once
    print("\n-- 20 async dispatches of prog0 + one block")
    def burst():
        ys = [progs[0](x) for _ in range(20)]
        ys[-1].block_until_ready()
    burst()
    ts = [t_once(burst) for _ in range(5)]
    print(" ".join(f"{t*1e3:7.2f}" for t in ts))

    # chained dependent dispatches (y = f(y)) x20 + one block
    print("\n-- 20 chained dispatches of prog0 + one block")
    def chain():
        y = x
        for _ in range(20):
            y = progs[0](y)
        y.block_until_ready()
    chain()
    ts = [t_once(chain) for _ in range(5)]
    print(" ".join(f"{t*1e3:7.2f}" for t in ts))

    # chain alternating two programs
    print("\n-- 20 chained alternating prog0/prog1 + one block")
    def chain2():
        y = x
        for i in range(20):
            y = progs[i % 2](y)
        y.block_until_ready()
    chain2()
    ts = [t_once(chain2) for _ in range(5)]
    print(" ".join(f"{t*1e3:7.2f}" for t in ts))

    # chain over 12 distinct programs
    print("\n-- 24 chained over progs 0..11 + one block")
    def chain12():
        y = x
        for i in range(24):
            y = progs[i % 12](y)
        y.block_until_ready()
    chain12()
    ts = [t_once(chain12) for _ in range(5)]
    print(" ".join(f"{t*1e3:7.2f}" for t in ts))


if __name__ == "__main__":
    main()
