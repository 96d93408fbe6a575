"""Output blob packing.

The remote TPU attachment pays a full round trip per fetched array and
tolerates no concurrent outstanding transfers, so pipeline outputs (a pytree
of ~15-25 arrays) are concatenated on device into two flat blobs -- one int32
(ints, bools, bitcast uint32) and one uint8 (sequence matrices) -- fetched
with two transfers and re-split on host with numpy views.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def blobify(tree):
    """Inside jit: flatten a pytree of arrays into (i32_blob, u8_blob)."""
    leaves = jax.tree_util.tree_leaves(tree)
    i32_parts, u8_parts = [], []
    for x in leaves:
        if x.dtype == jnp.uint8:
            u8_parts.append(x.reshape(-1))
        elif x.dtype == jnp.bool_:
            u8_parts.append(x.astype(jnp.uint8).reshape(-1))
        elif x.dtype == jnp.uint32:
            i32_parts.append(jax.lax.bitcast_convert_type(x, jnp.int32).reshape(-1))
        else:
            i32_parts.append(x.astype(jnp.int32).reshape(-1))
    i32 = (jnp.concatenate(i32_parts) if i32_parts
           else jnp.zeros((0,), jnp.int32))
    u8 = (jnp.concatenate(u8_parts) if u8_parts
          else jnp.zeros((0,), jnp.uint8))
    return i32, u8


def _build_spec(shaped_tree):
    """From a jax.eval_shape result: per-leaf (group, offset, shape, dtype)
    plus the treedef for reconstruction."""
    leaves, treedef = jax.tree_util.tree_flatten(shaped_tree)
    spec = []
    off_i32 = off_u8 = 0
    for x in leaves:
        size = int(np.prod(x.shape)) if x.shape else 1
        if x.dtype == jnp.uint8:
            spec.append(("u8", off_u8, x.shape, np.uint8))
            off_u8 += size
        elif x.dtype == jnp.bool_:
            spec.append(("u8", off_u8, x.shape, np.bool_))
            off_u8 += size
        elif x.dtype == jnp.uint32:
            spec.append(("i32", off_i32, x.shape, np.uint32))
            off_i32 += size
        else:
            spec.append(("i32", off_i32, x.shape, np.dtype(x.dtype.name)))
            off_i32 += size
    return treedef, spec


def unblobify(i32: np.ndarray, u8: np.ndarray, treedef, spec):
    leaves = []
    for group, off, shape, dtype in spec:
        size = int(np.prod(shape)) if shape else 1
        if group == "u8":
            arr = u8[off : off + size]
            if dtype == np.bool_:
                arr = arr.astype(bool)
            arr = arr.reshape(shape)
        else:
            arr = i32[off : off + size]
            if dtype == np.uint32:
                arr = arr.view(np.uint32)
            elif dtype == np.bool_:
                arr = arr.astype(bool)
            elif dtype != np.int32:
                arr = arr.astype(dtype)
            arr = arr.reshape(shape)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class BlobResult:
    """Lazy handle over the two in-flight device blobs."""

    __slots__ = ("_i32", "_u8", "_treedef", "_spec")

    def __init__(self, i32, u8, treedef, spec):
        self._i32 = i32
        self._u8 = u8
        self._treedef = treedef
        self._spec = spec

    def get(self):
        return unblobify(np.asarray(self._i32), np.asarray(self._u8),
                         self._treedef, self._spec)


class BlobCall:
    """Callable wrapper: runs ``body`` under jit returning blobs, re-splits on
    host.  The output spec per (static kwargs, input shapes) signature is
    computed once with jax.eval_shape.  The call dispatches asynchronously and
    returns a :class:`BlobResult`.

    With a mesh installed via :meth:`set_mesh`, batch inputs (arrays whose
    leading dimension matches the chunk rows) are placed sharded over the
    read axis; jit then runs the pipeline data-parallel across the mesh,
    inserting cross-device reductions for the stat sums.
    """

    def __init__(self, body, static_argnames: Tuple[str, ...]):
        self._body = body
        self._jit = jax.jit(
            lambda *a, **kw: blobify(body(*a, **kw)),
            static_argnames=static_argnames)
        self._specs: Dict[Any, Tuple] = {}
        self._mesh = None
        self._row_sharding = None

    def set_mesh(self, mesh) -> None:
        from jax.sharding import NamedSharding, PartitionSpec

        self._mesh = mesh
        if mesh is not None:
            axis = mesh.axis_names[0]
            self._row_sharding = NamedSharding(mesh, PartitionSpec(axis))

    def _place(self, args):
        if self._mesh is None:
            return args
        rows = max((a.shape[0] for a in args if getattr(a, "ndim", 0) >= 1),
                   default=0)
        out = []
        for a in args:
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == rows and \
                    rows % self._mesh.devices.size == 0:
                out.append(jax.device_put(a, self._row_sharding))
            else:
                out.append(a)
        return tuple(out)

    def __call__(self, *args, **static_kwargs) -> BlobResult:
        key = (tuple(sorted(static_kwargs.items())),
               tuple((tuple(a.shape), str(np.asarray(a).dtype)) for a in args))
        entry = self._specs.get(key)
        if entry is None:
            shaped = jax.eval_shape(
                functools.partial(self._body, **static_kwargs), *args)
            entry = _build_spec(shaped)
            self._specs[key] = entry
        treedef, spec = entry
        i32, u8 = self._jit(*self._place(args), **static_kwargs)
        return BlobResult(i32, u8, treedef, spec)
