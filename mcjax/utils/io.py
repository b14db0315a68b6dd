"""Trajectory dumps and checkpoint/resume.

* ``write_lammps_dump`` reproduces the reference's OVITO-compatible
  LAMMPS-style dump (``create_dump``, kernel.cu:510-536; sample artifact
  dumpR3.txt) so existing visualization workflows keep working.
* Checkpointing is first-class (the reference has none — runs are
  fire-and-forget, SURVEY.md §5): the full SimState pytree (positions,
  occupancy, Threefry key, sweep counter) round-trips exactly, and because
  all randomness is counter-based on (key, sweep), a resumed run is bitwise
  identical to an uninterrupted one (tested in test_sweep.py /
  test_io.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import IO

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState


def write_lammps_dump(f: IO[str] | str, frames: np.ndarray,
                      box_length: float,
                      types: np.ndarray | None = None) -> None:
    """Write [T, N, dim] position frames in the reference's dump format.

    Header layout follows create_dump (kernel.cu:528-532): per-frame TIMESTEP,
    NUMBER OF ATOMS, BOX BOUNDS (3 lines; 2D dumps get a flat z-slab), then
    ``id type x y z ix iy iz`` rows.

    ``types``: per-atom type column, [N] or [T, N] (mixtures: species id + 1
    so OVITO colors species; defaults to the reference's id-as-type).
    """
    frames = np.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    t_steps, n, dim = frames.shape
    half = box_length / 2.0
    if types is not None:
        types = np.asarray(types, np.int64)
        if types.ndim == 1:
            types = np.broadcast_to(types, (t_steps, n))

    own = isinstance(f, (str, os.PathLike))
    fh = open(f, "w") if own else f
    try:
        for t in range(t_steps):
            fh.write(f"ITEM: TIMESTEP \n{t}\nITEM: NUMBER OF ATOMS\n{n}\n")
            fh.write("ITEM: BOX BOUNDS\n")
            for _ in range(min(dim, 3)):
                fh.write(f"{-half:f} {half:f}\n")
            for _ in range(3 - dim):
                fh.write("-0.500000 0.500000\n")
            fh.write("ITEM: ATOMS id type x y z ix iy iz\n")
            for j in range(n):
                x = frames[t, j, 0]
                y = frames[t, j, 1]
                z = frames[t, j, 2] if dim == 3 else 0.0
                ty = int(types[t, j]) if types is not None else j + 1
                fh.write(f"{j + 1} {ty} {x:f} {y:f} {z:f} 0 0 0\n")
    finally:
        if own:
            fh.close()


def read_lammps_dump(path: str) -> np.ndarray:
    """Parse frames back ([T, N, 3]); inverse of write_lammps_dump (tests)."""
    frames, cur = [], None
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        if lines[i].startswith("ITEM: NUMBER OF ATOMS"):
            n = int(lines[i + 1])
            i += 2
        elif lines[i].startswith("ITEM: ATOMS"):
            cur = np.array([[float(v) for v in lines[i + 1 + j].split()[2:5]]
                            for j in range(n)])
            frames.append(cur)
            i += 1 + n
        else:
            i += 1
    return np.stack(frames)


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, cfg: SimConfig, state: SimState,
                    pot=None, extra_arrays: dict | None = None) -> None:
    """Persist config + potential + full state; atomic-rename so a crash
    can't corrupt. The potential rides along so a resumed run cannot
    silently continue under different physics (a resume must need no model
    flags at all).

    ``extra_arrays``: ensemble-specific payload (e.g. the NPT log_scale),
    stored under ``extra_<name>`` and read back via load_checkpoint_extras.
    """
    from mcjax.models.potentials import potential_to_dict

    tmp = path + ".tmp"
    extra = {}
    if pot is not None:
        extra["potential_json"] = json.dumps(potential_to_dict(pot))
    for k, v in (extra_arrays or {}).items():
        extra[f"extra_{k}"] = np.asarray(v)
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        pos=np.asarray(state.pos),
        occ=np.asarray(state.occ),
        key_data=np.asarray(jax.random.key_data(state.key)),
        sweep=np.asarray(state.sweep),
        overflow=np.asarray(state.overflow),
        config_json=json.dumps(dataclasses.asdict(cfg)),
        **extra,
    )
    # np.savez appends .npz if missing
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def load_checkpoint(path: str) -> tuple[SimConfig, SimState, "object | None"]:
    """Returns (cfg, state, potential); potential is None for checkpoints
    written without one (pre-round-2 files)."""
    from mcjax.models.potentials import potential_from_dict

    with np.load(path, allow_pickle=False) as z:
        cfg = SimConfig(**json.loads(str(z["config_json"])))
        pot = (potential_from_dict(json.loads(str(z["potential_json"])))
               if "potential_json" in z else None)
        state = SimState(
            pos=jnp.asarray(z["pos"]),
            occ=jnp.asarray(z["occ"]),
            key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])),
            sweep=jnp.asarray(z["sweep"]),
            overflow=jnp.asarray(z["overflow"]),
        )
    return cfg, state, pot


def load_checkpoint_extras(path: str) -> dict:
    """The ``extra_arrays`` payload of a checkpoint (e.g. NPT log_scale)."""
    with np.load(path, allow_pickle=False) as z:
        return {k[len("extra_"):]: np.asarray(z[k])
                for k in z.files if k.startswith("extra_")}


# ---- orbax backend (sharded / async-capable checkpoints at pod scale) -----

def save_checkpoint_orbax(path: str, cfg: SimConfig, state: SimState,
                          pot=None) -> None:
    """Orbax StandardCheckpointer backend: unlike the npz path this writes
    per-shard (no host gather), which is what a pod-scale domain-sharded run
    needs. The Threefry key is stored as raw key data."""
    import orbax.checkpoint as ocp

    from mcjax.models.potentials import potential_to_dict

    payload = {
        "pos": state.pos,
        "occ": state.occ,
        "key_data": jax.random.key_data(state.key),
        "sweep": state.sweep,
        "overflow": state.overflow,
    }
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    # orbax stores arrays only; static config + potential ride in a sidecar
    sidecar = {"config": dataclasses.asdict(cfg)}
    if pot is not None:
        sidecar["potential"] = potential_to_dict(pot)
    with open(path + ".config.json", "w") as fh:
        json.dump(sidecar, fh)


def load_checkpoint_orbax(path: str, state_shardings: SimState | None = None
                          ) -> tuple[SimConfig, SimState, "object | None"]:
    """Restore an orbax checkpoint; with ``state_shardings`` (a
    SimState-shaped tree of NamedShardings, e.g. from
    parallel.mesh.state_sharding) each array is restored DIRECTLY onto its
    mesh placement — per-shard reads, no host gather, the inverse of the
    per-shard save.  Scalars (key/sweep/overflow) use the replicated
    sharding from the tree."""
    import orbax.checkpoint as ocp

    from mcjax.models.potentials import potential_from_dict

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if state_shardings is None:
            z = ckptr.restore(path)
        else:
            md = ckptr.metadata(path).item_metadata.tree
            sc = state_shardings.key  # replicated

            def abstract(name, sh):
                m = md[name]
                return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                            sharding=sh)

            target = {
                "pos": abstract("pos", state_shardings.pos),
                "occ": abstract("occ", state_shardings.occ),
                "key_data": abstract("key_data", sc),
                "sweep": abstract("sweep", sc),
                "overflow": abstract("overflow", sc),
            }
            z = ckptr.restore(path, target)
    with open(path + ".config.json") as fh:
        sidecar = json.load(fh)
    if "config" in sidecar:
        cfg = SimConfig(**sidecar["config"])
        pot = (potential_from_dict(sidecar["potential"])
               if "potential" in sidecar else None)
    else:  # pre-round-2 sidecar: bare config dict, no potential
        cfg = SimConfig(**sidecar)
        pot = None
    state = SimState(
        pos=jnp.asarray(z["pos"]),
        occ=jnp.asarray(z["occ"]),
        key=jax.random.wrap_key_data(jnp.asarray(z["key_data"])),
        sweep=jnp.asarray(z["sweep"]),
        overflow=jnp.asarray(z["overflow"]),
    )
    return cfg, state, pot


def load_config_file(path: str) -> SimConfig:
    """SimConfig from a JSON or YAML file (the reference needs a recompile to
    change any parameter — kernel.cu:17-29)."""
    with open(path) as fh:
        if path.endswith((".yaml", ".yml")):
            import yaml
            data = yaml.safe_load(fh)
        else:
            data = json.load(fh)
    return SimConfig(**data)
