"""Map checkpointing: save/load the functional map state.

Reference: Atlas serialization to `.osa` archives via Boost.serialization
with pointer-fixup PreSave/PostLoad passes and an MD5 vocabulary checksum
(System::SaveAtlas src/System.cc:1413-1452, LoadAtlas:1455-1516,
CalculateCheckSum:1518-1556; per-object serialize in KeyFrame.h:58-180 etc.).

TPU re-design: the map IS a pytree of arrays — a checkpoint is a single
npz write, and the consistency problem the reference solves with pointer
fixup simply does not exist. The vocabulary checksum becomes a SHA-256 of
the place-recognition codebook (loading a map quantized with a different
codebook would corrupt place recognition the same way a vocabulary mismatch
does in the reference).
"""
from __future__ import annotations

import dataclasses
import hashlib

import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import state as mstate


def codebook_checksum(codebook) -> str:
    return hashlib.sha256(np.asarray(codebook).tobytes()).hexdigest()


def save_map(path: str, st: mstate.MapState, codebook=None, bow=None,
             extra: dict | None = None):
    """Write the map (+ optional place-recognition database) to an npz."""
    fields = {f.name: np.asarray(getattr(st, f.name))
              for f in dataclasses.fields(st) if f.name != "caps"}
    fields["_caps"] = np.asarray(list(st.caps), np.int64)
    if codebook is not None:
        fields["_codebook"] = np.asarray(codebook)
        fields["_codebook_sha"] = np.frombuffer(
            codebook_checksum(codebook).encode(), np.uint8)
    if bow is not None:
        fields["_bow"] = np.asarray(bow)
    for k, v in (extra or {}).items():
        fields[f"_extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **fields)


def load_map(path: str, expect_codebook=None):
    """Load a map checkpoint. If expect_codebook is given, verify the stored
    checksum matches (reference: vocabulary MD5 gate on LoadAtlas,
    src/System.cc:1455-1516). Returns (MapState, dict of extras)."""
    data = np.load(path)
    caps = mstate.MapCaps(*[int(x) for x in data["_caps"]])
    kwargs = {}
    rebuild_bits = False
    for f in dataclasses.fields(mstate.MapState):
        if f.name == "caps":
            continue
        if f.name == "lm_obs_bits" and f.name not in data:
            # pre-bitmask checkpoint: rebuild from the obs table below
            kwargs[f.name] = jnp.zeros(
                (caps.L, (caps.K + 31) // 32), jnp.int32)
            rebuild_bits = True
            continue
        kwargs[f.name] = jnp.asarray(data[f.name])
    st = mstate.MapState(caps=caps, **kwargs)
    if rebuild_bits:
        st = mstate.rebuild_obs_bits(st)
    extras = {}
    if "_codebook" in data:
        extras["codebook"] = jnp.asarray(data["_codebook"])
        if expect_codebook is not None:
            stored = bytes(data["_codebook_sha"]).decode()
            if stored != codebook_checksum(expect_codebook):
                raise ValueError(
                    "codebook checksum mismatch: this map was built with a "
                    "different place-recognition codebook")
    if "_bow" in data:
        extras["bow"] = jnp.asarray(data["_bow"])
    for k in data.files:
        if k.startswith("_extra_"):
            extras[k[len("_extra_"):]] = data[k]
    return st, extras
