"""Ahead-of-time (AOT) serialized serving executables.

The persistent XLA compile cache amortizes the 840-frame CASE program
reliably across process restarts, but the sweep-shaped program's
cross-process hit is at the mercy of remote-compile-service variance
(43–174 s observed for one identical program in one session — NOTES.md
probes r38/r40).  AOT packaging removes the compiler from the serving
boot path entirely: `cli warm --export-aot DIR` lowers + compiles the
exact case-serving programs once (image build time), serializes the
compiled EXECUTABLES (`jax.experimental.serialize_executable`), and a
fresh serving process (`predict --aot DIR`, `PredictConfig.aot_dir`)
deserializes them — probe r41 measured deserialize 0.45 s + one ~13 s
executable device load, outputs bit-identical to the jit path.

Entries are keyed by a fingerprint of everything that shapes the HLO:
the program name, the dynamic-argument shape/dtype tree (which pins the
model architecture via the parameter tree), every static argument
value, and the jax version + backend.  A lookup miss — wrong shape,
changed config, different jax — silently falls back to the jit path,
so a stale AOT directory can cost time but never correctness.
Executables are device-specific artifacts: export on the hardware (and
jax version) you deploy on.

Integrity/trust: each ``.jaxexec`` records its sha256 in
``manifest.json`` and ``load_executable`` refuses a payload whose
digest does not match (corruption, partial writes).  This is NOT a
security boundary — the manifest lives in the same directory, so an
attacker who can rewrite the payload can rewrite the digest too, and
deserialization goes through ``pickle``.  Treat ``aot_dir`` with
exactly the trust you give the code and the model weights (the
deployment image bakes all three together).
"""

from __future__ import annotations

import hashlib
import json
import pickle
from pathlib import Path
from typing import Any, Optional


def _tree_sig(tree: Any) -> Any:
    """JSON-able shape/dtype signature of a pytree of arrays (leaves that
    aren't array-like are repr'd)."""
    import jax

    def leaf(x):
        shape = getattr(x, "shape", None)
        dtype = getattr(x, "dtype", None)
        if shape is not None and dtype is not None:
            return [list(shape), str(dtype)]
        return repr(x)

    flat, treedef = jax.tree_util.tree_flatten(tree)
    return [str(treedef), [leaf(x) for x in flat]]


def program_key(name: str, dyn_args: tuple, dyn_kwargs: dict,
                statics: dict) -> str:
    """Stable fingerprint for one compiled serving program."""
    import jax

    payload = json.dumps({
        "name": name,
        "dyn_args": _tree_sig(dyn_args),
        "dyn_kwargs": _tree_sig(dyn_kwargs),
        "statics": {k: repr(v) for k, v in sorted(statics.items())},
        "jax": jax.__version__,
        "backend": jax.default_backend(),
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def save_executable(aot_dir, key: str, compiled, meta: dict) -> Path:
    """Serialize a `Compiled` to ``<dir>/<key>.jaxexec`` + manifest row."""
    from jax.experimental.serialize_executable import serialize

    d = Path(aot_dir)
    d.mkdir(parents=True, exist_ok=True)
    payload, in_tree, out_tree = serialize(compiled)
    path = d / f"{key}.jaxexec"
    with open(path, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    manifest = d / "manifest.json"
    rows = {}
    if manifest.exists():
        try:
            rows = json.loads(manifest.read_text())
        except ValueError:
            rows = {}
    import jax
    rows[key] = {**meta, "bytes": path.stat().st_size,
                 "sha256": hashlib.sha256(path.read_bytes()).hexdigest(),
                 "jax": jax.__version__, "backend": jax.default_backend()}
    manifest.write_text(json.dumps(rows, indent=1, sort_keys=True))
    return path


def load_executable(aot_dir, key: str, log=None):
    """Deserialize ``<dir>/<key>.jaxexec`` → callable, or None on any
    failure (missing entry, version/backend drift, corrupt file) so the
    caller falls back to jit."""
    path = Path(aot_dir) / f"{key}.jaxexec"
    if not path.exists():
        return None
    try:
        from jax.experimental.serialize_executable import \
            deserialize_and_load

        raw = path.read_bytes()
        manifest = Path(aot_dir) / "manifest.json"
        expected = None
        if manifest.exists():
            try:
                expected = json.loads(manifest.read_text()
                                      ).get(key, {}).get("sha256")
            except ValueError:
                expected = None
        if expected is not None and \
                hashlib.sha256(raw).hexdigest() != expected:
            raise ValueError("sha256 mismatch vs manifest — corrupt or "
                             "tampered entry")
        payload, in_tree, out_tree = pickle.loads(raw)
        return deserialize_and_load(payload, in_tree, out_tree)
    except Exception as e:  # noqa: BLE001 — any load failure → jit fallback
        if log:
            log(f"[aot] cannot load {path.name} ({type(e).__name__}: {e}); "
                f"falling back to jit")
        return None
