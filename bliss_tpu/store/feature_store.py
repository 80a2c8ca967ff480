"""Resumable feature store: content-addressed force vectors on disk.

The reference has no checkpoint/resume; its GUI example approximates it by
flushing one CSV row per song (reference: python/examples/analyze_gui.py:
37-49). Here resumability is first-class: features are keyed by a content
hash of the audio file, so interrupted library scans skip completed work,
renamed files keep their analysis, and re-encoded files re-analyze.

Layout: one NPZ shard per store flush + a JSON index; loads are merged into
an in-memory dict. Small (4 floats/song), so a 100k-song library is ~2 MB.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

import numpy as np


def file_fingerprint(path: str, quick: bool = True) -> str:
    """Content hash of an audio file. ``quick`` hashes size + head/tail
    blocks (robust to renames, cheap on large libraries); quick=False hashes
    the full file."""
    st = os.stat(path)
    h = hashlib.sha256()
    h.update(str(st.st_size).encode())
    with open(path, "rb") as f:
        if quick:
            h.update(f.read(1 << 16))
            if st.st_size > (1 << 17):
                f.seek(-(1 << 16), os.SEEK_END)
                h.update(f.read(1 << 16))
        else:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()[:32]


class FeatureStore:
    """Persistent {fingerprint: (force_vector, metadata)} map."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._lock = threading.Lock()
        self._features: dict[str, np.ndarray] = {}
        self._meta: dict[str, dict] = {}
        self._dirty: set[str] = set()
        self._load()

    def _index_path(self) -> str:
        return os.path.join(self.path, "index.json")

    def _load(self) -> None:
        idx = self._index_path()
        if not os.path.exists(idx):
            return
        with open(idx) as f:
            index = json.load(f)
        for shard in index.get("shards", []):
            p = os.path.join(self.path, shard)
            if not os.path.exists(p):
                continue
            with np.load(p, allow_pickle=False) as z:
                keys = [k for k in z["keys"]]
                feats = z["features"]
            for k, v in zip(keys, feats):
                self._features[str(k)] = v
        mp = os.path.join(self.path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)

    def __contains__(self, key: str) -> bool:
        return key in self._features

    def __len__(self) -> int:
        return len(self._features)

    def get(self, key: str) -> np.ndarray | None:
        return self._features.get(key)

    def put(self, key: str, features: np.ndarray, meta: dict | None = None) -> None:
        with self._lock:
            self._features[key] = np.asarray(features, np.float32)
            if meta:
                self._meta[key] = meta
            self._dirty.add(key)

    def flush(self) -> None:
        """Write pending entries as a new shard + update the index
        atomically (write-then-rename)."""
        with self._lock:
            if not self._dirty:
                return
            keys = sorted(self._dirty)
            feats = np.stack([self._features[k] for k in keys])
            shard = f"shard-{int(time.time() * 1000):x}-{len(keys)}.npz"
            tmp = os.path.join(self.path, shard + ".tmp")
            with open(tmp, "wb") as f:
                np.savez_compressed(
                    f, keys=np.array(keys), features=feats
                )
            os.replace(tmp, os.path.join(self.path, shard))

            idx = self._index_path()
            index = {"shards": []}
            if os.path.exists(idx):
                with open(idx) as f:
                    index = json.load(f)
            index.setdefault("shards", []).append(shard)
            tmp = idx + ".tmp"
            with open(tmp, "w") as f:
                json.dump(index, f)
            os.replace(tmp, idx)

            mp = os.path.join(self.path, "meta.json")
            with open(mp + ".tmp", "w") as f:
                json.dump(self._meta, f)
            os.replace(mp + ".tmp", mp)
            self._dirty.clear()

    def compact(self) -> None:
        """Merge all shards into one."""
        with self._lock:
            if not self._features:
                return
            keys = sorted(self._features)
            feats = np.stack([self._features[k] for k in keys])
            shard = f"shard-compact-{len(keys)}.npz"
            with open(os.path.join(self.path, shard + ".tmp"), "wb") as f:
                np.savez_compressed(f, keys=np.array(keys), features=feats)
            os.replace(
                os.path.join(self.path, shard + ".tmp"),
                os.path.join(self.path, shard),
            )
            old = []
            idx = self._index_path()
            if os.path.exists(idx):
                with open(idx) as f:
                    old = json.load(f).get("shards", [])
            with open(idx + ".tmp", "w") as f:
                json.dump({"shards": [shard]}, f)
            os.replace(idx + ".tmp", idx)
            for s in old:
                if s != shard:
                    try:
                        os.remove(os.path.join(self.path, s))
                    except OSError:
                        pass

    def items(self):
        return self._features.items()

    def metadata(self, key: str) -> dict:
        return self._meta.get(key, {})
