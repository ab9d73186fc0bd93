"""orb_slam2_annotate_tpu — a TPU-native visual SLAM framework.

A from-scratch re-design of the capabilities of ORB-SLAM2
(reference: /root/reference, Mur-Artal & Tardos TRO 2015/2017) for TPU
hardware: JAX/XLA/Pallas compute kernels, functional (pure-pytree) map
state instead of mutex-guarded shared memory, batched RANSAC instead of
sequential hypothesis loops, and one Levenberg-Marquardt engine with
Schur-complement landmark marginalization instead of g2o.

Subpackages
-----------
geometry   SE3/Sim3 Lie groups, camera models, triangulation, two-view geometry
ops        front-end kernels: pyramid, FAST, ORB descriptors, Hamming matching
solvers    LM engine: pose optimization, local/global BA, Sim3, PnP, pose graph
worldmap   functional map state (keyframes, map points, covisibility, BoW index)
pipeline   tracking / local mapping / loop closing / System facade
parallel   device-mesh sharding and distributed bundle adjustment
io         dataset readers, YAML config, trajectory export, ATE/RPE evaluation
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry and normal-equation math must be true float32: the default
# matmul precision lowers f32 dots to bf16 passes (~1e-2 relative error),
# which breaks Lie-group orthonormality and LM convergence.  Kernels that
# can tolerate bf16 opt in locally.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the pipeline is ~a dozen sizable XLA
# programs and host compile time dominates cold starts on small hosts.
# OPT-IN via ORBTPU_JAX_CACHE=<dir>: XLA:CPU AOT executable
# (de)serialization proved unreliable across machine migrations in this
# environment (entries written under different CPU features SIGILL on
# load; serialization can abort() the process — both observed r4), so
# the cache is no longer enabled by default.
import os as _os

_cache_dir = _os.environ.get("ORBTPU_JAX_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
