"""Disk cache for built acceleration structures, keyed by mesh hash.

The reference rebuilds its KD tree from the PLY on every launch and times it
on the console (WinMain.cpp:122-151); here the O(n log n) host build is
amortized across runs (SURVEY.md §5 "Checkpoint / resume"): np.savez keyed
by a content hash of the triangle AABBs + build parameters.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..accel.kd_build import KDTree

DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "cpp_cuda_raytracer_dev_tpu")


def mesh_key(aabb_min: np.ndarray, aabb_max: np.ndarray,
             min_node_size: int) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(aabb_min, np.float32).tobytes())
    h.update(np.ascontiguousarray(aabb_max, np.float32).tobytes())
    h.update(str(min_node_size).encode())
    return h.hexdigest()[:24]


_FIELDS = ("bounds_min", "bounds_max", "cut_code", "s1", "s2", "left",
           "right", "parent", "leaf_start", "leaf_count", "perm")


def save_tree(tree: KDTree, key: str,
              cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"kd_{key}.npz")
    # uncompressed: a dragon-scale tree saves in well under a second;
    # compression cost would eat the build-time win being cached
    np.savez(
        path, min_node_size=np.int64(tree.min_node_size),
        **{f: getattr(tree, f) for f in _FIELDS})
    return path


def load_tree(key: str, cache_dir: str = DEFAULT_CACHE_DIR) -> KDTree | None:
    path = os.path.join(cache_dir, f"kd_{key}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return KDTree(**{f: z[f] for f in _FIELDS},
                  min_node_size=int(z["min_node_size"]))


def build_kd_cached(aabb_min: np.ndarray, aabb_max: np.ndarray,
                    min_node_size: int = 1,
                    cache_dir: str = DEFAULT_CACHE_DIR) -> KDTree:
    """Cache-through KD build (native builder on miss)."""
    from ..accel.native import build_kd_fast

    key = mesh_key(aabb_min, aabb_max, min_node_size)
    tree = load_tree(key, cache_dir)
    if tree is None:
        tree = build_kd_fast(aabb_min, aabb_max, min_node_size)
        save_tree(tree, key, cache_dir)
    return tree
