"""Map checkpoint / resume.

The reference never implemented SaveMap/LoadMap (System.h:115-117 TODO);
here the entire map is one pytree of arrays, so checkpointing is a
single compressed npz plus a small JSON header.  The saved map can be
reloaded to continue mapping, to relocalize against (localization mode),
or to merge sessions.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import jax.numpy as jnp

from ..worldmap.map_state import MapState

FORMAT_VERSION = 1


def save_map(path: str, m: MapState, extra: dict | None = None) -> None:
    """Write the map (and optional metadata) to an .npz file."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    header = {
        "format_version": FORMAT_VERSION,
        "K": int(m.K), "P": int(m.P), "N": int(m.N),
        "extra": extra or {},
    }
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> tuple[MapState, dict]:
    """Read a map checkpoint.  Returns (MapState, extra_metadata)."""
    z = np.load(path, allow_pickle=False)
    header = json.loads(bytes(z["header"]).decode())
    if header["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported map format {header['format_version']}")
    fields = {
        k[len("map_"):]: jnp.asarray(z[k])
        for k in z.files if k.startswith("map_")
    }
    return MapState(**fields), header.get("extra", {})
