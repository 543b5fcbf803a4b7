"""Custom optimizers: GaLore, APOLLO, BAdam, Adam-mini, Muon, LoRA+.

TPU-native counterparts of the reference's custom-optimizer factory
(train/stage_sft/llamafactory/train/trainer_utils.py:199-515 --
_create_galore_optimizer, _create_apollo_optimizer,
_create_loraplus_optimizer, _create_badam_optimizer,
_create_adam_mini_optimizer; Muon appears in newer LLaMA-Factory
revisions).  Each is an optax GradientTransformation over plain pytrees.
Where the torch versions hook per-parameter torch.optim instances, these
run as pure jit-compatible transforms with static shapes: periodic
projection refreshes use lax.cond, block cycling uses masks derived from
the step counter, so everything composes with pjit sharding unchanged.

Structural divergences from the torch implementations (deliberate):

* Decoder layers here are stacked on a leading axis ([L, in, out]), so
  "one transformer block" is a leading-axis slice, not a parameter group;
  BAdam masks that axis directly.
* GaLore's SVD refresh runs inside jit under lax.cond (computed only on
  refresh steps) instead of a host-side optimizer re-init.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def default_matrix_target(path: str, leaf) -> bool:
    """Reference default: all linear-module weights with ndim > 1
    (galore_target/apollo_target == ["all"], trainer_utils.py:204-213)."""
    return path.endswith("kernel") and leaf.ndim in (2, 3)


def _project_shapes(shape: tuple[int, ...], rank: int):
    """GaLore 'std' orientation: project whichever of the last two dims is
    larger so the low-rank factor keeps the smaller dim intact."""
    *batch, m, n = shape
    r = min(rank, m, n)
    if m >= n:
        # right projection: proj [*, r, n]; low = g @ proj^T -> [*, m, r]
        return tuple(batch) + (r, n), tuple(batch) + (m, r), "right"
    # left projection: proj [*, m, r]; low = proj^T @ g -> [*, r, n]
    return tuple(batch) + (m, r), tuple(batch) + (r, n), "left"


def _svd_proj(g: jax.Array, rank: int, side: str) -> jax.Array:
    u, _, vh = jnp.linalg.svd(g.astype(jnp.float32), full_matrices=False)
    if side == "right":
        return vh[..., :rank, :]
    return u[..., :, :rank]


def _rand_proj(key, shape, rank: int) -> jax.Array:
    return jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(
        jnp.asarray(rank, jnp.float32)
    )


def _down(g, proj, side):
    if side == "right":
        return jnp.einsum("...mn,...rn->...mr", g, proj)
    return jnp.einsum("...mr,...rn->...mn", jnp.swapaxes(proj, -1, -2), g)


def _up(low, proj, side):
    if side == "right":
        return jnp.einsum("...mr,...rn->...mn", low, proj)
    return jnp.einsum("...mr,...rn->...mn", proj, low)


class _LowRankLeaf(NamedTuple):
    proj: jax.Array
    m: jax.Array
    v: jax.Array


class _AdamLeaf(NamedTuple):
    m: jax.Array
    v: jax.Array


class GaLoreState(NamedTuple):
    count: jax.Array
    leaves: Any


def scale_by_galore(
    rank: int = 16,
    update_proj_gap: int = 200,
    scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    target: Callable[[str, Any], bool] = default_matrix_target,
) -> optax.GradientTransformation:
    """GaLore: Adam moments in a rank-r subspace of each weight matrix.

    Matches GaLoreAdamW as wired by _create_galore_optimizer
    (trainer_utils.py:199-287): SVD projection refreshed every
    ``update_proj_gap`` steps, 'std' projection orientation, back-projected
    update multiplied by ``scale``.  Non-targeted leaves get plain Adam.
    """

    def is_target(path, leaf):
        p = _path_str(path)
        return target(p, leaf) and min(leaf.shape[-2:]) > rank

    def init(params):
        def leaf_init(path, p):
            if is_target(path, p):
                proj_shape, low_shape, _ = _project_shapes(p.shape, rank)
                return _LowRankLeaf(
                    proj=jnp.zeros(proj_shape, jnp.float32),
                    m=jnp.zeros(low_shape, jnp.float32),
                    v=jnp.zeros(low_shape, jnp.float32),
                )
            return _AdamLeaf(
                m=jnp.zeros_like(p, jnp.float32),
                v=jnp.zeros_like(p, jnp.float32),
            )

        return GaLoreState(
            count=jnp.zeros((), jnp.int32),
            leaves=jax.tree_util.tree_map_with_path(leaf_init, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        refresh = (state.count % update_proj_gap) == 0

        def leaf_update(path, g, st):
            g32 = g.astype(jnp.float32)
            if isinstance(st, _LowRankLeaf):
                _, _, side = _project_shapes(g.shape, rank)
                r = min(rank, *g.shape[-2:])
                proj = jax.lax.cond(
                    refresh,
                    lambda: _svd_proj(g32, r, side),
                    lambda: st.proj,
                )
                low = _down(g32, proj, side)
                m = b1 * st.m + (1 - b1) * low
                v = b2 * st.v + (1 - b2) * jnp.square(low)
                mhat = m / (1 - b1 ** count.astype(jnp.float32))
                vhat = v / (1 - b2 ** count.astype(jnp.float32))
                direction = _up(mhat / (jnp.sqrt(vhat) + eps), proj, side)
                return (scale * direction).astype(g.dtype), _LowRankLeaf(proj, m, v)
            m = b1 * st.m + (1 - b1) * g32
            v = b2 * st.v + (1 - b2) * jnp.square(g32)
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            return (mhat / (jnp.sqrt(vhat) + eps)).astype(g.dtype), _AdamLeaf(m, v)

        flat = jax.tree_util.tree_map_with_path(
            leaf_update, updates, state.leaves,
            is_leaf=lambda x: isinstance(x, (_LowRankLeaf, _AdamLeaf)),
        )
        is_pair = lambda x: isinstance(x, tuple) and len(x) == 2 and not isinstance(x, (_LowRankLeaf, _AdamLeaf))
        new_updates = jax.tree_util.tree_map(
            lambda x: x[0], flat, is_leaf=is_pair)
        new_leaves = jax.tree_util.tree_map(
            lambda x: x[1], flat, is_leaf=is_pair)
        return new_updates, GaLoreState(count=count, leaves=new_leaves)

    return optax.GradientTransformation(init, update)


class ApolloLeaf(NamedTuple):
    m: jax.Array
    v: jax.Array
    prev_norm: jax.Array


class ApolloState(NamedTuple):
    count: jax.Array
    leaves: Any


def scale_by_apollo(
    rank: int = 16,
    update_proj_gap: int = 200,
    scale: float = 1.0,
    scale_type: str = "channel",   # channel | tensor (apollo vs apollo-mini)
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    seed: int = 0,
    norm_growth_limit: float = 1.01,
    target: Callable[[str, Any], bool] = default_matrix_target,
) -> optax.GradientTransformation:
    """APOLLO: memory-efficient channel-wise gradient scaling.

    Counterpart of APOLLOAdamW as wired by _create_apollo_optimizer
    (trainer_utils.py:287-370).  Adam moments live in a rank-r *random*
    projection of the gradient; the full-rank update is the raw gradient
    rescaled per channel by ||adam_dir_channel|| / ||low_grad_channel||
    (tensor-wise for apollo-mini), with APOLLO's norm-growth limiter
    clamping step-to-step update-norm growth.  Random projections are
    regenerated every ``update_proj_gap`` steps from a counter-derived key,
    so no projection matrix is stored.
    """

    def is_target(path, leaf):
        return target(_path_str(path), leaf) and min(leaf.shape[-2:]) > rank

    def init(params):
        def leaf_init(path, p):
            if is_target(path, p):
                _, low_shape, _ = _project_shapes(p.shape, rank)
                return ApolloLeaf(
                    m=jnp.zeros(low_shape, jnp.float32),
                    v=jnp.zeros(low_shape, jnp.float32),
                    prev_norm=jnp.zeros((), jnp.float32),
                )
            return _AdamLeaf(
                m=jnp.zeros_like(p, jnp.float32),
                v=jnp.zeros_like(p, jnp.float32),
            )

        return ApolloState(
            count=jnp.zeros((), jnp.int32),
            leaves=jax.tree_util.tree_map_with_path(leaf_init, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        epoch = state.count // update_proj_gap
        leaf_idx = [0]

        def leaf_update(path, g, st):
            g32 = g.astype(jnp.float32)
            if isinstance(st, ApolloLeaf):
                idx = leaf_idx[0]
                leaf_idx[0] += 1
                proj_shape, _, side = _project_shapes(g.shape, rank)
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(seed), idx), epoch
                )
                proj = _rand_proj(key, proj_shape, min(rank, *g.shape[-2:]))
                low = _down(g32, proj, side)
                m = b1 * st.m + (1 - b1) * low
                v = b2 * st.v + (1 - b2) * jnp.square(low)
                mhat = m / (1 - b1 ** count.astype(jnp.float32))
                vhat = v / (1 - b2 ** count.astype(jnp.float32))
                low_dir = mhat / (jnp.sqrt(vhat) + eps)
                # channel = the non-projected dim: rows for 'right'
                # ([*, m, r]), columns for 'left' ([*, r, n])
                ch_axis = -1 if side == "right" else -2
                if scale_type == "channel":
                    # [*, m, 1] ('right') or [*, 1, n] ('left'): broadcasts
                    # over the projected dim of g
                    s = jnp.linalg.norm(low_dir, axis=ch_axis, keepdims=True) / (
                        jnp.linalg.norm(low, axis=ch_axis, keepdims=True) + eps
                    )
                else:  # tensor (apollo-mini)
                    s = jnp.linalg.norm(low_dir) / (jnp.linalg.norm(low) + eps)
                direction = g32 * s * scale
                norm = jnp.linalg.norm(direction)
                # norm-growth limiter (APOLLO paper sec. 3.3)
                limit = jnp.where(
                    st.prev_norm > 0,
                    jnp.minimum(norm, st.prev_norm * norm_growth_limit),
                    norm,
                )
                direction = direction * jnp.where(norm > 0, limit / (norm + 1e-30), 1.0)
                return direction.astype(g.dtype), ApolloLeaf(m, v, limit)
            m = b1 * st.m + (1 - b1) * g32
            v = b2 * st.v + (1 - b2) * jnp.square(g32)
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            return (mhat / (jnp.sqrt(vhat) + eps)).astype(g.dtype), _AdamLeaf(m, v)

        flat = jax.tree_util.tree_map_with_path(
            leaf_update, updates, state.leaves,
            is_leaf=lambda x: isinstance(x, (ApolloLeaf, _AdamLeaf)),
        )
        is_pair = lambda x: isinstance(x, tuple) and len(x) == 2 and not isinstance(x, (ApolloLeaf, _AdamLeaf))
        new_updates = jax.tree_util.tree_map(lambda x: x[0], flat, is_leaf=is_pair)
        new_leaves = jax.tree_util.tree_map(lambda x: x[1], flat, is_leaf=is_pair)
        return new_updates, ApolloState(count=count, leaves=new_leaves)

    return optax.GradientTransformation(init, update)


class BAdamState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any


def scale_by_badam(
    num_layers: int | None = None,
    switch_interval: int = 50,
    switch_mode: str = "ascending",   # ascending | descending | random
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    seed: int = 0,
) -> optax.GradientTransformation:
    """BAdam: block-coordinate Adam cycling one transformer block at a time.

    Counterpart of badam.BlockOptimizer in layer mode
    (_create_badam_optimizer, trainer_utils.py:411-470).  Blocks are the
    leading-axis slices of stacked layer leaves ([L, ...]); every leaf
    without that leading dim (embeddings, lm_head, final norm) forms one
    extra block, giving L+1 blocks total.  On each switch boundary the
    newly-active block's moments restart from zero (the torch version
    instantiates a fresh Adam per block), with bias correction driven by
    the within-block step count.
    """

    def infer_layers(params):
        dims = {
            leaf.shape[0]
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if leaf.ndim == 3 and _path_str(path).endswith("kernel")
        }
        if not dims:
            return 0
        return max(dims)

    def init(params):
        return BAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            v=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
        )

    def update(updates, state, params=None):
        L = num_layers or infer_layers(updates)
        n_blocks = L + 1
        slot = state.count // switch_interval
        cycle = slot // n_blocks
        pos = slot % n_blocks
        if switch_mode == "ascending":
            active = pos
        elif switch_mode == "descending":
            active = n_blocks - 1 - pos
        elif switch_mode == "random":
            perm = jax.random.permutation(
                jax.random.fold_in(jax.random.PRNGKey(seed), cycle), n_blocks
            )
            active = perm[pos]
        else:
            raise ValueError(f"unknown switch_mode {switch_mode!r}")
        fresh = (state.count % switch_interval) == 0
        t_local = (state.count % switch_interval).astype(jnp.float32) + 1.0

        def leaf_update(path, g, m, v):
            p = _path_str(path)
            g32 = g.astype(jnp.float32)
            layer_stacked = (
                ("layers" in p or "blocks" in p)
                and g.ndim >= 2 and g.shape[0] == L
            )
            if layer_stacked:
                mask = (jnp.arange(L) == active).astype(jnp.float32)
                mask = mask.reshape((L,) + (1,) * (g.ndim - 1))
            else:
                mask = (active == L).astype(jnp.float32)
            m_eff = jnp.where(fresh, m * (1 - mask), m)
            v_eff = jnp.where(fresh, v * (1 - mask), v)
            m_new = m_eff + mask * ((b1 - 1) * m_eff + (1 - b1) * g32)
            v_new = v_eff + mask * ((b2 - 1) * v_eff + (1 - b2) * jnp.square(g32))
            mhat = m_new / (1 - b1 ** t_local)
            vhat = v_new / (1 - b2 ** t_local)
            direction = mask * mhat / (jnp.sqrt(vhat) + eps)
            return direction.astype(g.dtype), m_new, v_new

        flat = jax.tree_util.tree_map_with_path(
            leaf_update, updates, state.m, state.v)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
        new_updates = jax.tree_util.tree_map(lambda x: x[0], flat, is_leaf=is_triple)
        new_m = jax.tree_util.tree_map(lambda x: x[1], flat, is_leaf=is_triple)
        new_v = jax.tree_util.tree_map(lambda x: x[2], flat, is_leaf=is_triple)
        return new_updates, BAdamState(count=state.count + 1, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)


class AdamMiniState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any


def scale_by_adam_mini(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    head_dim: int | None = None,
) -> optax.GradientTransformation:
    """Adam-mini: one second-moment scalar per parameter block.

    Counterpart of _create_adam_mini_optimizer (trainer_utils.py:472-495).
    Block partition (paper sec. 4): embedding/lm_head rows get per-row v;
    attention q/k kernels get per-head v when ``head_dim`` is given
    (output dim grouped into heads); other matrices get per-output-neuron
    v; 1-D leaves keep elementwise v (negligible memory).  First moments
    stay full-shape, as in the original.
    """

    def v_reduce(path: str, g: jax.Array) -> jax.Array:
        g2 = jnp.square(g)
        if g.ndim <= 1:
            return g2
        if "embed" in path or "lm_head" in path:
            return g2.mean(axis=-1, keepdims=True)
        if head_dim and ("attn/q" in path or "attn/k" in path) and g.shape[-1] % head_dim == 0:
            heads = g.shape[-1] // head_dim
            shaped = g2.reshape(g.shape[:-2] + (g.shape[-2], heads, head_dim))
            per_head = shaped.mean(axis=(-3, -1))          # [*, heads]
            # broadcastable [*, 1, out]: one value per head, repeated in-head
            return jnp.expand_dims(jnp.repeat(per_head, head_dim, axis=-1), -2)
        return g2.mean(axis=-2, keepdims=True)

    def init(params):
        def leaf_v(path, p):
            return jnp.zeros_like(
                v_reduce(_path_str(path), p.astype(jnp.float32))
            )

        return AdamMiniState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            v=jax.tree_util.tree_map_with_path(leaf_v, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)

        def leaf_update(path, g, m, v):
            g32 = g.astype(jnp.float32)
            m_new = b1 * m + (1 - b1) * g32
            v_new = b2 * v + (1 - b2) * v_reduce(_path_str(path), g32)
            mhat = m_new / (1 - b1 ** cf)
            vhat = v_new / (1 - b2 ** cf)
            direction = mhat / (jnp.sqrt(vhat) + eps)
            return direction.astype(g.dtype), m_new, v_new

        flat = jax.tree_util.tree_map_with_path(leaf_update, updates, state.m, state.v)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
        new_updates = jax.tree_util.tree_map(lambda x: x[0], flat, is_leaf=is_triple)
        new_m = jax.tree_util.tree_map(lambda x: x[1], flat, is_leaf=is_triple)
        new_v = jax.tree_util.tree_map(lambda x: x[2], flat, is_leaf=is_triple)
        return new_updates, AdamMiniState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)


def muon(
    learning_rate,
    beta: float = 0.95,
    weight_decay: float = 0.0,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
) -> optax.GradientTransformation:
    """Muon (Newton-Schulz orthogonalized momentum) over stacked-layer trees.

    Wraps optax.contrib.muon with dimension numbers that treat the leading
    layer axis of stacked kernels ([L, in, out]) as a batch axis, matching
    how newer LLaMA-Factory revisions route hidden matrices to Muon and
    everything else (embeddings, heads, 1-D leaves) to Adam.
    """
    import optax.contrib as contrib

    def dim_numbers(params):
        def per_leaf(path, leaf):
            p = _path_str(path)
            if "embed" in p or "lm_head" in p or leaf.ndim < 2:
                return None  # Adam path
            if leaf.ndim == 3:
                return contrib.MuonDimensionNumbers(reduction_axis=1, output_axis=2)
            if leaf.ndim == 2:
                return contrib.MuonDimensionNumbers()
            return None

        return jax.tree_util.tree_map_with_path(per_leaf, params)

    return contrib.muon(
        learning_rate,
        beta=beta,
        weight_decay=weight_decay,
        adam_b1=adam_b1,
        adam_b2=adam_b2,
        muon_weight_dimension_numbers=dim_numbers,
    )


def loraplus(
    schedule,
    lr_ratio: float = 16.0,
    lr_embedding: float = 1e-6,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """LoRA+: the B factors step ``lr_ratio`` times faster than the A factors.

    Counterpart of _create_loraplus_optimizer (trainer_utils.py:371-409):
    lora_b group at lr*ratio, lora_a at base lr, embedding adapters at
    ``lr_embedding``.  LoRA leaves here are named ``.../a`` and ``.../b``
    (train/adapters.py init_lora_params).
    """

    def labels(params):
        def per_leaf(path, leaf):
            del leaf
            p = _path_str(path)
            if p.endswith("/b") or p == "b":
                return "embed" if "embed" in p else "lora_b"
            return "lora_a"

        return jax.tree_util.tree_map_with_path(per_leaf, params)

    def adamw_lr(lr):
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)

    if callable(schedule):
        b_lr = lambda c: schedule(c) * lr_ratio
    else:
        b_lr = schedule * lr_ratio
    return optax.multi_transform(
        {
            "lora_a": adamw_lr(schedule),
            "lora_b": adamw_lr(b_lr),
            "embed": adamw_lr(lr_embedding),
        },
        labels,
    )
