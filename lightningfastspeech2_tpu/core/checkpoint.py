"""Checkpoint / resume.

The reference enriches Lightning ``.ckpt`` pickles with non-tensor state so
inference needs no dataset (reference ``fastspeech2.py:622-634,530-620``).
Here (SURVEY.md §5.4): orbax for the jax pytrees {params, opt_state, step}
+ a JSON/NPZ sidecar for config, stats, vocab, and speaker tables. Atomic
per-step directories, ``latest`` resolution, and a warm-start mode that
drops shape-mismatched tensors like the reference's ``strict=False`` load
(``fastspeech2.py:599-620``).

``use_async=True`` writes on a background thread (orbax AsyncCheckpointer):
``save()`` blocks only for the device->host copy, the ``latest`` marker is
published in ``wait_until_finished()`` after the write committed, and
``restore``/``latest_path`` wait implicitly — so a crash mid-write can
never leave ``latest`` pointing at a torn checkpoint.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from lightningfastspeech2_tpu.core import config as C


class Checkpointer:
    def __init__(self, directory, use_async: bool = False):
        # orbax/tensorstore requires absolute paths (a relative
        # --checkpoint_dir crashes at the first save otherwise)
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._async = bool(use_async)
        # async mode: orbax copies device->host synchronously inside
        # save() (so donated buffers may be reused immediately) and
        # serializes to disk on a background thread — at 76M (~1 GB with
        # Adam moments) the training loop no longer stalls for the write.
        # The ``latest`` marker is only advanced in wait_until_finished()
        # after the write committed, so a crash mid-write leaves ``latest``
        # pointing at the previous durable checkpoint.
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if self._async
            else ocp.PyTreeCheckpointer()
        )
        self._pending: Optional[str] = None

    # ------------------------------------------------------------------ save
    def save(
        self,
        step: int,
        state: Any,
        cfg: Optional[C.Config] = None,
        sidecar: Optional[Dict[str, Any]] = None,
    ) -> Path:
        """sidecar may contain: stats (dict), phone2id (dict),
        speaker2id (dict), speaker2dvector {name: np.ndarray},
        speaker2priors {name: {prior: np.ndarray}}."""
        # one in-flight write at a time: finalize the previous async save
        # (and publish its ``latest`` marker) before starting this one
        self.wait_until_finished()
        path = self.dir / f"step_{step:08d}"
        # multi-host: every process calls orbax save (it coordinates the
        # sharded write internally); all OTHER filesystem writes (rmtree,
        # config/sidecar/marker) happen on process 0 only, with barriers
        # so no process enters the orbax write while the stale directory
        # is being removed
        multi = self._process_count() > 1
        if self._is_main() and path.exists():
            shutil.rmtree(path)
        if multi:
            self._barrier(f"ckpt_pre_save_{step}")
        self._ckptr.save(
            path / "tree",
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
            },
        )
        if not self._is_main():
            if self._async:
                self._pending = path.name
            if multi and not self._async:
                self._barrier(f"ckpt_post_save_{step}")
            return path
        if cfg is not None:
            C.save_json(cfg, str(path / "config.json"))
        if sidecar:
            json_side = {}
            np_side: Dict[str, np.ndarray] = {}
            for key, value in sidecar.items():
                if key == "speaker2dvector":
                    for name, vec in value.items():
                        np_side[f"dvec::{name}"] = np.asarray(vec)
                elif key == "speaker2priors":
                    for name, priors in value.items():
                        for prior, arr in priors.items():
                            np_side[f"prior::{name}::{prior}"] = np.asarray(arr)
                else:
                    json_side[key] = value
            (path / "sidecar.json").write_text(json.dumps(json_side))
            if np_side:
                np.savez(path / "sidecar.npz", **np_side)
        if self._async:
            self._pending = path.name
        else:
            (self.dir / "latest").write_text(path.name)
            if multi:
                # other processes may read ``latest`` right after save()
                self._barrier(f"ckpt_post_save_{step}")
        return path

    @staticmethod
    def _is_main() -> bool:
        import jax

        return jax.process_index() == 0

    @staticmethod
    def _process_count() -> int:
        import jax

        return jax.process_count()

    @staticmethod
    def _barrier(name: str) -> None:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)

    def wait_until_finished(self) -> None:
        """Block until any in-flight async write committed, then publish
        its ``latest`` marker. No-op for sync checkpointers."""
        if not self._async:
            return
        self._ckptr.wait_until_finished()
        if self._pending is not None:
            if self._is_main():
                (self.dir / "latest").write_text(self._pending)
            pending, self._pending = self._pending, None
            if self._process_count() > 1:
                self._barrier(f"ckpt_publish_{pending}")

    # --------------------------------------------------------------- restore
    def latest_path(self) -> Optional[Path]:
        self.wait_until_finished()
        marker = self.dir / "latest"
        if not marker.exists():
            return None
        path = self.dir / marker.read_text().strip()
        return path if path.exists() else None

    def restore(self, path: Optional[Path] = None, template: Any = None):
        """Returns (tree, cfg, sidecar). ``template`` (a matching pytree of
        arrays) restores with the template's exact container types, dtypes
        and shardings — orbax's own metadata turns tuples/NamedTuples
        (optax states) into lists, so the plain restore is re-flattened
        into the template's treedef and each leaf re-placed on the
        template leaf's sharding (works under multi-host: every process
        reads the full arrays, then device_put keeps only its addressable
        shards)."""
        self.wait_until_finished()
        path = Path(path) if path else self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        tree = self._ckptr.restore(path / "tree")
        if template is not None:
            import jax

            tdef = jax.tree_util.tree_structure(template)
            leaves = jax.tree_util.tree_leaves(tree)
            t_leaves = jax.tree_util.tree_leaves(template)
            if len(leaves) != len(t_leaves):
                raise ValueError(
                    f"checkpoint has {len(leaves)} leaves, template has "
                    f"{len(t_leaves)}"
                )

            def place(leaf, t):
                arr = np.asarray(leaf, dtype=getattr(t, "dtype", None))
                sharding = getattr(t, "sharding", None)
                if sharding is not None:
                    return jax.device_put(arr, sharding)
                return arr

            tree = jax.tree_util.tree_unflatten(
                tdef, [place(l, t) for l, t in zip(leaves, t_leaves)]
            )
        cfg = None
        if (path / "config.json").exists():
            cfg = C.load_json(str(path / "config.json"))
        sidecar: Dict[str, Any] = {}
        if (path / "sidecar.json").exists():
            sidecar = json.loads((path / "sidecar.json").read_text())
        if (path / "sidecar.npz").exists():
            data = np.load(path / "sidecar.npz", allow_pickle=False)
            dvec: Dict[str, np.ndarray] = {}
            priors: Dict[str, Dict[str, np.ndarray]] = {}
            for key in data.files:
                if key.startswith("dvec::"):
                    dvec[key[6:]] = data[key]
                elif key.startswith("prior::"):
                    _, name, prior = key.split("::")
                    priors.setdefault(name, {})[prior] = data[key]
            if dvec:
                sidecar["speaker2dvector"] = dvec
            if priors:
                sidecar["speaker2priors"] = priors
        return tree, cfg, sidecar


def warm_start(params: Any, restored: Any) -> Tuple[Any, int, int]:
    """Merge a restored params tree into a freshly-initialized one,
    dropping mismatched shapes / unknown keys (the reference's tolerant
    resume, ``fastspeech2.py:599-620``). Returns (merged, used, dropped)."""
    import jax

    used = dropped = 0
    flat_new = jax.tree_util.tree_flatten_with_path(params)
    flat_old = dict(jax.tree_util.tree_flatten_with_path(restored)[0])

    merged_leaves = []
    for path, leaf in flat_new[0]:
        old = flat_old.get(path)
        if old is not None and getattr(old, "shape", None) == leaf.shape:
            merged_leaves.append(jax.numpy.asarray(old, leaf.dtype)
                                 if hasattr(leaf, "dtype") else old)
            used += 1
        else:
            merged_leaves.append(leaf)
            dropped += 1
    merged = jax.tree_util.tree_unflatten(flat_new[1], merged_leaves)
    return merged, used, dropped
