"""Pytree-native Module system.

TPU-native replacement for the reference's ``nn::Module`` registry
(reference: include/nn.h:28-61, src/nn.cpp:12-146). Instead of a mutable
object graph with explicit ``register_module`` / ``register_parameter`` calls,
a :class:`Module` here *is* a JAX pytree: its array-valued dataclass fields are
the parameters (leaves), its submodule fields are subtrees, and everything
marked :func:`static_field` is hashable metadata baked into the jit cache key.

This buys, for free, what the reference hand-rolls:

* recursive parameter/submodule discovery with qualified, collision-free names
  (reference: src/nn.cpp:87-146) -> :func:`named_parameters` via pytree key
  paths;
* ``train()/eval()`` mode toggling (reference: src/nn.cpp:35-46) ->
  :func:`inference_mode`, which flips the ``inference`` flag on every
  submodule functionally (no requires_grad mutation needed --
  differentiability is decided by ``jax.grad``'s argument partition);
* ``zero_grad`` (reference: src/nn.cpp:24-34) -> not needed; grads are fresh
  values returned by ``jax.grad``.

Non-trainable state (e.g. BatchNorm running stats) does NOT live on the
module; it lives in a separate :class:`~gnn_tpu.nn.state.State` store so that
``partition(model)`` cleanly yields exactly the trainable leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, Tuple, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Module",
    "static_field",
    "field",
    "partition",
    "combine",
    "is_array",
    "named_parameters",
    "parameter_count",
    "state_dict",
    "load_state_dict",
    "inference_mode",
    "map_modules",
    "tree_at",
]

M = TypeVar("M", bound="Module")


def static_field(**kwargs) -> dataclasses.Field:
    """A dataclass field stored as pytree *metadata* (hashable, traced-over)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs) -> dataclasses.Field:
    """A regular (pytree-leaf / subtree) dataclass field."""
    return dataclasses.field(**kwargs)


def _is_static_annotation(cls, name: str) -> bool:
    for f in dataclasses.fields(cls):
        if f.name == name:
            return bool(f.metadata.get("static"))
    return False


class Module:
    """Base class: subclasses become dataclasses registered as JAX pytrees.

    Subclasses may define a custom ``__init__``; otherwise the dataclass
    constructor is generated. Fields default to pytree data; mark
    configuration fields with ``static_field()``.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        has_custom_init = "__init__" in cls.__dict__
        dataclasses.dataclass(cls, init=not has_custom_init, repr=False, eq=False)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(cls):
            if f.metadata.get("static"):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        cls._data_fields = tuple(data_fields)
        cls._meta_fields = tuple(meta_fields)

        # Manual registration (not register_dataclass) so classes with custom
        # __init__s reconstruct via object.__new__, bypassing the constructor.
        def flatten_with_keys(obj):
            children = [
                (jax.tree_util.GetAttrKey(n), getattr(obj, n))
                for n in cls._data_fields
            ]
            aux = tuple(getattr(obj, n) for n in cls._meta_fields)
            return children, aux

        def flatten(obj):
            return (
                [getattr(obj, n) for n in cls._data_fields],
                tuple(getattr(obj, n) for n in cls._meta_fields),
            )

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for n, v in zip(cls._data_fields, children):
                object.__setattr__(obj, n, v)
            for n, v in zip(cls._meta_fields, aux):
                object.__setattr__(obj, n, v)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    # -- convenience -------------------------------------------------------

    def replace(self: M, **changes) -> M:
        """Functional field update (modules are immutable by convention).

        Structural copy via object.__new__ — does NOT re-run __init__, so it
        works for modules with custom constructors."""
        names = {f.name for f in dataclasses.fields(self)}
        unknown = set(changes) - names
        if unknown:
            raise TypeError(f"replace() got unknown fields {sorted(unknown)}")
        new = object.__new__(type(self))
        for name in names:
            object.__setattr__(
                new, name, changes.get(name, getattr(self, name))
            )
        return new

    def __repr__(self) -> str:  # compact, shape-oriented repr
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, (jax.Array, np.ndarray)):
                parts.append(f"{f.name}={v.dtype}{list(v.shape)}")
            elif isinstance(v, Module):
                parts.append(f"{f.name}={type(v).__name__}(...)")
            elif isinstance(v, (list, tuple)) and v and isinstance(v[0], Module):
                parts.append(f"{f.name}=[{len(v)} x {type(v[0]).__name__}]")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"


# ---------------------------------------------------------------------------
# Partitioning: split a model into (trainable arrays, everything else)
# ---------------------------------------------------------------------------


def is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def _is_trainable(x) -> bool:
    return is_array(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)


class _Static:
    """Sentinel holding a non-trainable leaf inside the static partition."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __repr__(self):
        return f"_Static({self.value!r})"


def partition(model: M, filter_fn: Callable[[Any], bool] = _is_trainable):
    """Split ``model`` into ``(params, static)``.

    ``params`` is a pytree of the same structure with non-trainable leaves
    replaced by ``None``; ``static`` carries the rest. Reassemble with
    :func:`combine`. This is what you differentiate:

        params, static = partition(model)
        grads = jax.grad(lambda p: loss(combine(p, static)))(params)
    """
    leaves, treedef = jax.tree_util.tree_flatten(model)
    params = [x if filter_fn(x) else None for x in leaves]
    static = [None if filter_fn(x) else _Static(x) for x in leaves]
    return (
        jax.tree_util.tree_unflatten(treedef, params),
        (treedef, static),
    )


def combine(params, static) -> Any:
    """Inverse of :func:`partition`."""
    treedef, static_leaves = static
    # None params are placeholders; tree_flatten drops None so flatten with
    # is_leaf to keep positions aligned.
    param_leaves = treedef.flatten_up_to(params)
    merged = [
        s.value if s is not None else p
        for p, s in zip(param_leaves, static_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, merged)


# ---------------------------------------------------------------------------
# Named traversal (reference: src/nn.cpp:87-146 named_modules/named_parameters)
# ---------------------------------------------------------------------------


def _key_to_str(key) -> str:
    if isinstance(key, jax.tree_util.GetAttrKey):
        return key.name
    if isinstance(key, jax.tree_util.SequenceKey):
        return str(key.idx)
    if isinstance(key, jax.tree_util.DictKey):
        return str(key.key)
    if isinstance(key, jax.tree_util.FlattenedIndexKey):
        return str(key.key)
    return str(key)


def named_parameters(model: Module) -> Iterator[Tuple[str, jax.Array]]:
    """Yield ``(dotted_name, array)`` for every array leaf, depth-first.

    Names are qualified by attribute path, so they are collision-free by
    construction (the reference prefixes duplicate names by hand,
    src/nn.cpp:98-109)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(model)
    for path, leaf in flat:
        if is_array(leaf):
            yield ".".join(_key_to_str(k) for k in path), leaf


def parameter_count(model: Module, trainable_only: bool = True) -> int:
    total = 0
    for _, v in named_parameters(model):
        if not trainable_only or _is_trainable(v):
            total += int(np.prod(v.shape)) if v.shape else 1
    return total


def state_dict(model: Module) -> dict:
    """Flat {qualified_name: array} mapping — the checkpointable view.

    The reference's closest analog is the in-memory ``named_parameters()`` /
    ``named_buffers()`` maps (src/nn.cpp:110-138); here the same names key an
    Orbax-serializable dict."""
    return dict(named_parameters(model))


def load_state_dict(model: M, params: dict) -> M:
    """Return a copy of ``model`` with array leaves replaced from ``params``."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    for path, leaf in flat:
        if is_array(leaf):
            name = ".".join(_key_to_str(k) for k in path)
            if name not in params:
                raise KeyError(f"state dict is missing parameter '{name}'")
            new = jnp.asarray(params[name])
            if tuple(new.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for '{name}': checkpoint {tuple(new.shape)} "
                    f"vs model {tuple(leaf.shape)}"
                )
            new_leaves.append(new)
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# Structural surgery
# ---------------------------------------------------------------------------


def map_modules(fn: Callable[[Module], Module], module: Any) -> Any:
    """Rebuild a tree, applying ``fn`` to every Module instance bottom-up."""
    if isinstance(module, Module):
        changes = {}
        for f in dataclasses.fields(module):
            v = getattr(module, f.name)
            nv = map_modules(fn, v)
            if nv is not v:
                changes[f.name] = nv
        out = module.replace(**changes) if changes else module
        return fn(out)
    if isinstance(module, (list, tuple)):
        mapped = [map_modules(fn, v) for v in module]
        if all(a is b for a, b in zip(mapped, module)):
            return module
        return type(module)(mapped)
    if isinstance(module, dict):
        return {k: map_modules(fn, v) for k, v in module.items()}
    return module


def inference_mode(model: M, value: bool = True) -> M:
    """Functionally flip the ``inference`` flag on every submodule that has one.

    Equivalent of the reference's ``train()/eval()`` (src/nn.cpp:35-46), minus
    the requires_grad mutation (grad participation is decided at
    :func:`partition` time instead)."""

    def flip(m: Module) -> Module:
        if any(f.name == "inference" for f in dataclasses.fields(m)):
            return m.replace(inference=value)
        return m

    return map_modules(flip, model)


def tree_at(where: Callable[[M], Any], model: M, replace: Any) -> M:
    """Out-of-place replacement of one sub-node selected by ``where``.

    Example: ``tree_at(lambda m: m.lin.weight, model, new_w)``.
    """
    target = where(model)
    found = [False]

    def swap(node):
        if node is target and not found[0]:
            found[0] = True
            return replace
        return node

    leaves, treedef = jax.tree_util.tree_flatten(
        model, is_leaf=lambda n: n is target
    )
    new_leaves = [swap(l) for l in leaves]
    if not found[0]:
        raise ValueError("tree_at: target node not found in model")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
