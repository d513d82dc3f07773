"""Vault: persist replay-buffer trajectories to disk for offline MARL.

Replaces flashbax's `Vault` (used by the experience-recording system, reference
`mava/advanced_usage/ff_ippo_store_experience.py:50-54`). Trajectory slabs with leaves
(batch, time, ...) are appended along the time axis into per-leaf .npy shards plus a
JSON manifest; `read()` reloads the concatenated dataset. No external deps — numpy
memmap-friendly .npy files, one directory per vault.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


class Vault:
    def __init__(
        self,
        vault_name: str,
        experience_structure: Optional[Any] = None,
        rel_dir: str = "vaults",
        vault_uid: Optional[str] = None,
    ):
        from datetime import datetime

        uid = vault_uid or datetime.now().strftime("%Y%m%d%H%M%S")
        self.base_dir = os.path.join(os.getcwd(), rel_dir, vault_name, uid)
        os.makedirs(self.base_dir, exist_ok=True)
        self._manifest_path = os.path.join(self.base_dir, "manifest.json")
        self._chunk_count = 0
        self._paths: Optional[List[str]] = None
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                manifest = json.load(f)
            self._chunk_count = manifest["chunk_count"]
            self._paths = manifest["paths"]

    def write(self, experience: Any) -> int:
        """Append one trajectory slab (pytree, leaves (batch, time, ...)).

        Leaves are named by their pytree key path (e.g. `.obs.agents_view`,
        sanitized for filenames), so consumers (`read()`, offline training —
        `examples/bc_from_vault.py`) address fields by name rather than
        flatten position."""
        path_leaves = jax.tree_util.tree_flatten_with_path(experience)[0]
        leaves = [leaf for _, leaf in path_leaves]
        treedef = jax.tree.structure(experience)
        if self._paths is None:
            names = [
                re.sub(r"[^\w.]+", "_", jax.tree_util.keystr(path)).strip("_")
                for path, _ in path_leaves
            ]
            # Fall back to positional names on collision/empty (exotic trees).
            if len(set(names)) != len(names) or any(not n for n in names):
                names = [f"leaf_{i}" for i in range(len(leaves))]
            self._paths = names
            with open(os.path.join(self.base_dir, "treedef.txt"), "w") as f:
                f.write(str(treedef))
        chunk_dir = os.path.join(self.base_dir, f"chunk_{self._chunk_count:06d}")
        os.makedirs(chunk_dir, exist_ok=True)
        written = 0
        for name, leaf in zip(self._paths, leaves):
            arr = np.asarray(leaf)
            np.save(os.path.join(chunk_dir, f"{name}.npy"), arr)
            written += arr.size
        self._chunk_count += 1
        with open(self._manifest_path, "w") as f:
            json.dump({"chunk_count": self._chunk_count, "paths": self._paths}, f)
        return written

    def read(self) -> Dict[str, np.ndarray]:
        """Load all chunks, concatenated along the time axis, keyed by leaf name."""
        out: Dict[str, List[np.ndarray]] = {}
        for c in range(self._chunk_count):
            chunk_dir = os.path.join(self.base_dir, f"chunk_{c:06d}")
            for name in self._paths or []:
                out.setdefault(name, []).append(
                    np.load(os.path.join(chunk_dir, f"{name}.npy"))
                )
        return {k: np.concatenate(v, axis=1) for k, v in out.items()}
