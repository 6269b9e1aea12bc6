"""Training loops.

The reference has all the *pieces* of a training step (loss, optimizers,
backward) but no loop anywhere — main() is empty (SURVEY.md §3.3,
main.cpp:32-36). This module is that missing subsystem: jitted full-graph
and sampled-minibatch loops with eval, early stopping, metrics, and
checkpointing, driven by the Config tree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu import nn, optim
from gnn_tpu.graphs.data import Data
from gnn_tpu.graphs.sampling import NeighborSampler
from gnn_tpu.models import GAT, GCN, GIN, EncoderGCN, GraphSAGE
from gnn_tpu.train.config import Config
from gnn_tpu.train.metrics import MetricLogger, Throughput

__all__ = ["build_model", "build_optimizer", "fit", "evaluate"]


def build_model(cfg: Config, in_features: int, num_classes: int, key):
    m = cfg.model
    if m.name == "gcn":
        return GCN(
            in_features, m.hidden, num_classes, key=key,
            num_layers=m.num_layers, dropout=m.dropout,
        )
    if m.name == "sage":
        return GraphSAGE(
            in_features, m.hidden, num_classes, key=key,
            num_layers=m.num_layers, aggr=m.aggr, dropout=m.dropout,
        )
    if m.name == "gat":
        return GAT(
            in_features, m.hidden, num_classes, key=key,
            num_layers=m.num_layers, heads=m.heads, dropout=m.dropout,
        )
    if m.name == "gin":
        return GIN(
            in_features, m.hidden, num_classes, key=key, num_layers=m.num_layers
        )
    if m.name == "encoder_gcn":
        return EncoderGCN(
            in_features, num_classes, key=key,
            num_layers=m.num_layers, dropout=m.dropout,
        )
    raise ValueError(f"unknown model '{m.name}'")


def build_optimizer(cfg: Config) -> optim.GradientTransformation:
    o = cfg.optim
    if o.name == "adam":
        base = optim.adam(o.lr, weight_decay=o.weight_decay)
    elif o.name == "adamw":
        base = optim.adamw(o.lr, weight_decay=o.weight_decay)
    elif o.name == "sgd":
        base = optim.sgd(o.lr, momentum=o.momentum, weight_decay=o.weight_decay)
    else:
        raise ValueError(f"unknown optimizer '{o.name}'")
    if o.grad_clip > 0:
        return optim.chain(optim.clip_by_global_norm(o.grad_clip), base)
    return base


def _needs_state(model) -> bool:
    return any(isinstance(leaf, nn.StateIndex)
               for leaf in jax.tree_util.tree_leaves(
                   model, is_leaf=lambda l: isinstance(l, nn.StateIndex)))


def _evaluate_arrays(model, state, x, graph, y, masks: dict) -> dict:
    """Accuracy per split on explicit arrays (single-chip or padded/sharded;
    masks are False on padding rows so they never count)."""
    m = nn.inference_mode(model)
    if state is not None:
        logits, _ = m(x, graph, state)
    else:
        logits = m(x, graph)
    return {
        f"{split}_acc": float(nn.accuracy(logits, y, mask))
        for split, mask in masks.items()
        if mask is not None
    }


def evaluate(model, state, data: Data, adj) -> dict:
    masks = {s: getattr(data, f"{s}_mask") for s in ("train", "val", "test")}
    return _evaluate_arrays(model, state, data.x, adj, data.y, masks)


def fit(
    cfg: Config,
    data: Data,
    *,
    model=None,
    resume: bool = False,
    verbose: bool = True,
) -> Tuple[object, Optional[nn.State], list]:
    """Train per config. Returns (trained model, buffer state, history).

    ``resume=True`` restores model/optimizer/buffers from the latest
    checkpoint in ``cfg.train.checkpoint_dir`` (if one exists) and
    continues — the crash-recovery capability the reference has no analog
    for (SURVEY.md §5: "Checkpoint / resume: ABSENT")."""
    key = jax.random.PRNGKey(cfg.train.seed)
    key, mkey = jax.random.split(key)
    num_classes = int(np.asarray(data.y).max()) + 1
    if model is None:
        model = build_model(cfg, data.num_features, num_classes, mkey)
    state = nn.init_state(model) if _needs_state(model) else None

    dp_sampled = cfg.dist.num_parts > 1 and cfg.train.batch_size > 0
    distributed = cfg.dist.num_parts > 1 and not dp_sampled
    if dp_sampled and cfg.train.batch_size % cfg.dist.num_parts:
        raise ValueError(
            f"train.batch_size={cfg.train.batch_size} must divide evenly "
            f"over dist.num_parts={cfg.dist.num_parts} chips"
        )
    if cfg.train.host_features and not cfg.train.batch_size:
        raise ValueError("train.host_features requires batch_size > 0")
    if cfg.train.host_features and dp_sampled:
        raise ValueError(
            "train.host_features is the single-process host-gather path; "
            "combine it with data-parallel sampling by running one process "
            "per host (parallel.multihost) instead of dist.num_parts"
        )
    if distributed and state is not None:
        # BatchNorm models train distributed via the mask-aware batch
        # statistics: the padded layout's validity mask is passed through
        # the model so padding rows never enter the stats. The model must
        # accept a ``mask`` kwarg (EncoderGCN and GCNConv do).
        import inspect

        params = inspect.signature(type(model).__call__).parameters
        accepts_mask = "mask" in params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
        # A **kwargs signature is accepted (wrapped/forwarding models), but
        # the kwarg must actually be honored — a model that swallows it
        # would silently fold padding rows into its batch statistics.
        if not accepts_mask:
            raise ValueError(
                f"{type(model).__name__} carries buffer state (BatchNorm "
                "running stats) but its __call__ accepts no 'mask' kwarg: "
                "batch statistics over the padded distributed node layout "
                "would fold padding rows in. Add mask support (see "
                "nn.BatchNorm / models.EncoderGCN) or train single-chip."
            )
    if distributed:
        from gnn_tpu.parallel import make_mesh, shard_node_array

        n_parts = cfg.dist.num_parts
        devs = jax.devices()
        if n_parts > len(devs):
            raise ValueError(
                f"dist.num_parts={n_parts} but only {len(devs)} devices"
            )
        mesh = make_mesh(
            (n_parts,), (cfg.dist.axis_name,), devices=devs[:n_parts]
        )
        halo = cfg.dist.halo
        R_blk = int(cfg.dist.local_blocked)
        if R_blk and halo != "overlap":
            # local_blocked needs the local/remote edge split that only the
            # 'overlap' mode builds (config docs: "implies halo='overlap'").
            # The default 'alltoall' upgrades silently; a non-default choice
            # was deliberate, so don't discard it without notice (ADVICE r3).
            if halo != "alltoall":
                import warnings

                warnings.warn(
                    f"dist.local_blocked={R_blk} requires halo='overlap'; "
                    f"overriding dist.halo='{halo}'",
                    stacklevel=2,
                )
            halo = "overlap"
        if cfg.dist.cluster_order or R_blk:
            # Community-contiguous relabeling: the node-range partition then
            # cuts between communities, shrinking the halo (exact — GNNs are
            # permutation-equivariant; labels/masks permute alongside).
            # With local_blocked, also pack communities into R-row windows
            # so the dense diagonal blocks capture the intra-community edges.
            from gnn_tpu.graphs import cluster_order as _cluster_order

            data = data.permute_nodes(
                _cluster_order(
                    np.asarray(data.edge_index),
                    data.num_nodes,
                    pack_rows=R_blk,
                )
            )
        graph = data.to_dist_graph(
            mesh=mesh,
            halo=halo,
            axis_name=cfg.dist.axis_name,
            local_blocked=R_blk,
        )
        x_in = shard_node_array(graph, data.x, mesh)
        y_in = graph.shard_nodes(data.y)
        # Padding rows get mask=False, so the masked loss mean and every
        # split accuracy exclude them exactly.
        masks = {
            s: (
                None
                if getattr(data, f"{s}_mask") is None
                else graph.shard_nodes(getattr(data, f"{s}_mask"), fill=False)
            )
            for s in ("train", "val", "test")
        }
        # Validity mask over the padded layout (False on padding rows) for
        # mask-aware BatchNorm statistics in stateful models.
        bn_mask = (
            graph.shard_nodes(jnp.ones(data.num_nodes, bool), fill=False)
            if state is not None
            else None
        )
    elif cfg.train.host_features:
        # papers100M regime: NOTHING graph/feature-sized moves to the
        # device — training samples and gathers on the host, and eval is
        # neighbor-sampled through the same loader (below). Works with
        # Data(host_arrays=True) holding memmaps.
        bn_mask = None
        graph = x_in = y_in = None
        masks = {s: getattr(data, f"{s}_mask") for s in ("train", "val", "test")}
    else:
        bn_mask = None
        # Single-chip full graph: optionally relabel nodes for the
        # combine-free sorted layout or the community-packed blocked one
        # (exact — GNNs are permutation-equivariant; metrics/masks are
        # permuted alongside).
        reorder = {
            "auto": "auto",
            "true": True,
            "false": False,
            "cluster": "cluster",
        }[str(cfg.train.reorder).lower()]
        if reorder and cfg.train.batch_size > 0:
            reorder = False  # sampled minibatches index data.x directly
        graph = data.to_adjacency(norm="sym", reorder=reorder)
        if graph.perm is not None:
            data = data.permute_nodes(np.asarray(graph.perm))
        x_in, y_in = data.x, data.y
        masks = {s: getattr(data, f"{s}_mask") for s in ("train", "val", "test")}
    train_mask_in = masks["train"]
    params, static = nn.partition(model)
    opt = build_optimizer(cfg)
    opt_state = opt.init(params)
    logger = MetricLogger(cfg.train.log_file, echo=verbose)

    ckpt = None
    start_epoch = 0
    if cfg.train.checkpoint_dir:
        from gnn_tpu.train.checkpoint import Checkpointer

        ckpt = Checkpointer(cfg.train.checkpoint_dir)
        if resume and ckpt.latest_step() is not None:
            model2 = nn.combine(params, static)
            model2, opt_state, state, _ = ckpt.restore(model2, opt_state, state)
            params, static = nn.partition(model2)
            start_epoch = int(ckpt.latest_step())

    sampled = cfg.train.batch_size > 0
    if sampled and dp_sampled:
        # Data-parallel sampled minibatches: each chip samples and computes
        # the loss for batch_size/P seeds inside shard_map; the gradient
        # psum falls out of shard_map's AD transpose (params are replicated
        # captures, so their cotangents sum across the 'data' axis). The
        # sampler is pure jnp with static shapes, so it shards like any
        # other array program (graphs/sampling.py).
        from jax.sharding import PartitionSpec as PSpec

        from gnn_tpu.parallel import make_mesh

        n_parts = cfg.dist.num_parts
        devs = jax.devices()
        if n_parts > len(devs):
            raise ValueError(
                f"dist.num_parts={n_parts} but only {len(devs)} devices"
            )
        mesh = make_mesh(
            (n_parts,), (cfg.dist.axis_name,), devices=devs[:n_parts]
        )
        sampler = NeighborSampler(data, cfg.train.fanouts)
        train_ids = np.nonzero(np.asarray(data.train_mask))[0]
        x_full, y_full = data.x, data.y
        spec = PSpec(cfg.dist.axis_name)

        @jax.jit
        def step(params, opt_state, key, seeds):
            keys = jax.random.split(key, n_parts)

            def loss_fn(p):
                m = nn.combine(p, static)

                def local(seeds_l, keys_l):
                    k = keys_l[0]
                    nodes, adjs = sampler.sample(k, seeds_l)
                    logits = m.forward_sampled(
                        jnp.take(x_full, nodes, axis=0), adjs, key=k
                    )
                    return nn.cross_entropy(
                        logits, jnp.take(y_full, seeds_l)
                    )[None]

                losses = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(spec, spec),
                    out_specs=spec,
                    axis_names={cfg.dist.axis_name},
                )(seeds, keys)
                return jnp.mean(losses)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(grads, opt_state, params)
            return optim.apply_updates(params, upd), opt_state, loss
    elif sampled and cfg.train.host_features:
        # Host-resident features (papers100M regime): sampling + feature
        # gather on the host (memmap-friendly), only the [batch_nodes, F]
        # slab ships per step. The jitted step is keyed by static shapes,
        # so one compile serves every batch (train/host_loader.py).
        from gnn_tpu.train.host_loader import HostBatchLoader

        loader = HostBatchLoader(
            np.asarray(data.edge_index),
            np.asarray(data.x),
            np.asarray(data.y),
            cfg.train.fanouts,
            num_nodes=data.num_nodes,
            seed=cfg.train.seed,
        )
        train_ids = np.nonzero(np.asarray(data.train_mask))[0]
        host_adjs = loader.adjacencies(cfg.train.batch_size)

        @jax.jit
        def host_step(params, opt_state, key, feats, ys):
            def loss_fn(p):
                m = nn.combine(p, static)
                logits = m.forward_sampled(feats, host_adjs, key=key)
                return nn.cross_entropy(logits, ys)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(grads, opt_state, params)
            return optim.apply_updates(params, upd), opt_state, loss

        def step(params, opt_state, key, seeds):
            feats, ys = loader.batch(np.asarray(seeds))
            return host_step(
                # device_put: the proxied transport ships asarray ~1000x
                # slower for large host slabs (graphs/streaming.py)
                params, opt_state, key, jax.device_put(feats), jax.device_put(ys)
            )

        # Neighbor-sampled evaluation (the standard large-graph inference
        # approximation): accuracy per split from loader minibatches — no
        # device-resident x or adjacency at any point.
        eval_bs = cfg.train.batch_size

        @jax.jit
        def host_infer(params, feats):
            m = nn.inference_mode(nn.combine(params, static))
            return m.forward_sampled(feats, host_adjs)

        def host_evaluate(params) -> dict:
            out = {}
            for split in ("train", "val", "test"):
                mask = masks.get(split)
                if mask is None:
                    continue
                ids = np.nonzero(np.asarray(mask))[0]
                if not len(ids):
                    continue
                correct = 0
                for lo in range(0, len(ids), eval_bs):
                    chunk = ids[lo : lo + eval_bs]
                    n = len(chunk)
                    padded = np.concatenate(
                        [chunk, np.zeros(eval_bs - n, np.int64)]
                    )
                    feats, ys = loader.batch(padded)
                    logits = np.asarray(
                        host_infer(params, jax.device_put(feats))
                    )
                    correct += int((logits[:n].argmax(-1) == ys[:n]).sum())
                out[f"{split}_acc"] = correct / len(ids)
            return out
    elif sampled:
        sampler = NeighborSampler(data, cfg.train.fanouts)
        train_ids = np.nonzero(np.asarray(data.train_mask))[0]

        @jax.jit
        def step(params, opt_state, key, seeds):
            def loss_fn(p):
                m = nn.combine(p, static)
                nodes, adjs = sampler.sample(key, seeds)
                logits = m.forward_sampled(data.x[nodes], adjs, key=key)
                return nn.cross_entropy(logits, data.y[seeds])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(grads, opt_state, params)
            return optim.apply_updates(params, upd), opt_state, loss
    else:

        @jax.jit
        def step(params, opt_state, state, key):
            def loss_fn(p):
                m = nn.combine(p, static)
                if state is not None:
                    if bn_mask is not None:
                        logits, new_state = m(
                            x_in, graph, state, key=key, mask=bn_mask
                        )
                    else:
                        logits, new_state = m(x_in, graph, state, key=key)
                else:
                    logits, new_state = m(x_in, graph, key=key), None
                return nn.cross_entropy(logits, y_in, train_mask_in), new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt_state = opt.update(grads, opt_state, params)
            return optim.apply_updates(params, upd), opt_state, new_state, loss

    history = []
    best_val, best_params, patience_left = -1.0, None, cfg.train.patience
    rng_np = np.random.default_rng(cfg.train.seed)
    thr = Throughput(data.num_edges)
    thr.start()
    for epoch in range(start_epoch, cfg.train.epochs):
        key, k = jax.random.split(key)
        if sampled:
            seeds = jnp.asarray(
                rng_np.choice(train_ids, cfg.train.batch_size), jnp.int32
            )
            params, opt_state, loss = step(params, opt_state, k, seeds)
        else:
            params, opt_state, state, loss = step(params, opt_state, state, k)
        thr.step()

        if (epoch + 1) % cfg.train.eval_every == 0 or epoch == cfg.train.epochs - 1:
            model_now = nn.combine(params, static)
            if cfg.train.host_features:
                metrics = host_evaluate(params)
            else:
                metrics = _evaluate_arrays(model_now, state, x_in, graph, y_in, masks)
            metrics["loss"] = float(loss)
            metrics["edges_per_s"] = thr.edges_per_s
            logger.log(epoch + 1, **metrics)
            history.append(metrics)
            if ckpt and cfg.train.checkpoint_every and (
                (epoch + 1) % cfg.train.checkpoint_every == 0
            ):
                ckpt.save(epoch + 1, model_now, opt_state, state)
            val = metrics.get("val_acc")
            if cfg.train.patience and val is not None:
                if val > best_val:
                    best_val, best_params, patience_left = val, params, cfg.train.patience
                else:
                    patience_left -= 1
                    if patience_left <= 0:
                        break

    if best_params is not None:
        params = best_params
    model = nn.combine(params, static)
    if ckpt:
        ckpt.save(cfg.train.epochs, model, opt_state, state)
        ckpt.close()
    logger.close()
    return model, state, history
