"""Custom optimizers: GaLore, APOLLO, BAdam, Adam-mini, Muon, LoRA+.

Counterparts of the reference's create_custom_optimizer family
(train/stage_sft/llamafactory/train/trainer_utils.py:199-515).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from iadr1_tpu.train import custom_optim
from iadr1_tpu.train.optimizers import OptimizerConfig, make_optimizer


L, IN, OUT = 3, 24, 40


def make_params(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "embed": {"weight": jax.random.normal(k1, (50, IN)) * 0.1},
        "layers": {
            "mlp": {"up": {"kernel": jax.random.normal(k2, (L, IN, OUT)) * 0.1}},
            "norm": 1.0 + jax.random.normal(k4, (L, IN)) * 0.1,
        },
        "lm_head": {"kernel": jax.random.normal(k3, (IN, 50)) * 0.1},
    }


def quadratic_loss(params, target):
    return sum(
        jnp.sum((a - b) ** 2)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(target))
    )


def run_steps(opt, params, target, n=30):
    state = opt.init(params)
    losses = []

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(quadratic_loss)(params, target)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(n):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return params, losses


@pytest.fixture
def problem():
    params = make_params(jax.random.PRNGKey(0))
    target = make_params(jax.random.PRNGKey(1))
    return params, target


def test_galore_descends_and_state_is_low_rank(problem):
    params, target = problem
    rank = 4
    opt = optax.chain(
        custom_optim.scale_by_galore(rank=rank, update_proj_gap=10, scale=1.0),
        optax.scale_by_learning_rate(0.05),
    )
    new_params, losses = run_steps(opt, params, target, n=60)
    # rank-4 subspace of min-dim-24 matrices: descent is real but partial
    assert losses[-1] < 0.35 * losses[0]
    state = opt.init(params)[0]
    leaf = state.leaves["layers"]["mlp"]["up"]["kernel"]
    # [L, IN, OUT] with IN < OUT -> right-proj impossible; IN(24)<OUT(40)
    # means m<n -> left projection: proj [L, IN, r], moments [L, r, OUT]
    assert leaf.proj.shape == (L, IN, rank)
    assert leaf.m.shape == (L, rank, OUT)
    # embeddings are not nn.Linear -> not GaLore-targeted (reference
    # find_all_linear_modules), so they keep full Adam moments
    emb = state.leaves["embed"]["weight"]
    assert emb.m.shape == (50, IN)
    # 1-D norm leaves fall back to full Adam moments
    assert state.leaves["layers"]["norm"].m.shape == (L, IN)


def test_galore_projection_refresh_changes_projection(problem):
    params, target = problem
    opt = custom_optim.scale_by_galore(rank=2, update_proj_gap=2, scale=1.0)
    state = opt.init(params)
    grads = jax.grad(quadratic_loss)(params, target)
    _, s1 = opt.update(grads, state, params)          # refresh at count 0
    p1 = s1.leaves["lm_head"]["kernel"].proj
    _, s2 = opt.update(grads, s1, params)             # hold
    p2 = s2.leaves["lm_head"]["kernel"].proj
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    grads2 = jax.grad(quadratic_loss)(
        jax.tree_util.tree_map(lambda x: x * 0.5, params), target)
    _, s3 = opt.update(grads2, s2, params)            # refresh at count 2
    p3 = s3.leaves["lm_head"]["kernel"].proj
    assert not np.allclose(np.asarray(p2), np.asarray(p3))


def test_apollo_descends(problem):
    params, target = problem
    opt = optax.chain(
        custom_optim.scale_by_apollo(rank=4, update_proj_gap=5, scale=1.0),
        optax.scale_by_learning_rate(0.05),
    )
    _, losses = run_steps(opt, params, target, n=40)
    assert losses[-1] < 0.3 * losses[0]


def test_apollo_tensor_scale_descends(problem):
    params, target = problem
    opt = optax.chain(
        custom_optim.scale_by_apollo(rank=1, scale_type="tensor"),
        optax.scale_by_learning_rate(0.05),
    )
    _, losses = run_steps(opt, params, target, n=40)
    assert losses[-1] < 0.5 * losses[0]


def test_badam_updates_only_active_block(problem):
    params, target = problem
    opt = custom_optim.scale_by_badam(switch_interval=2, switch_mode="ascending")
    state = opt.init(params)
    grads = jax.grad(quadratic_loss)(params, target)
    updates, state = opt.update(grads, state, params)
    up = np.asarray(updates["layers"]["mlp"]["up"]["kernel"])
    norm_up = np.asarray(updates["layers"]["norm"])
    # step 0: active block = layer 0
    assert np.abs(up[0]).max() > 0
    assert np.abs(up[1:]).max() == 0
    assert np.abs(norm_up[0]).max() > 0 and np.abs(norm_up[1:]).max() == 0
    # embeddings / head belong to the extra block -> untouched now
    assert np.abs(np.asarray(updates["embed"]["weight"])).max() == 0
    # advance to the extra block: blocks are [0,1,2,extra], interval 2;
    # the call made with internal count 6 lands on slot 3 = extra block
    for _ in range(6):
        updates, state = opt.update(grads, state, params)
    assert np.abs(np.asarray(updates["embed"]["weight"])).max() > 0
    assert np.abs(np.asarray(updates["layers"]["mlp"]["up"]["kernel"])).max() == 0


def test_badam_descends_over_full_cycle(problem):
    params, target = problem
    opt = optax.chain(
        custom_optim.scale_by_badam(switch_interval=5),
        optax.scale_by_learning_rate(0.05),
    )
    _, losses = run_steps(opt, params, target, n=40)  # 2 full cycles
    assert losses[-1] < 0.3 * losses[0]


def test_adam_mini_v_is_blockwise(problem):
    params, target = problem
    opt = custom_optim.scale_by_adam_mini(head_dim=8)
    state = opt.init(params)
    # embed [50, IN] -> per-row v [50, 1]
    assert state.v["embed"]["weight"].shape == (50, 1)
    # mlp up [L, IN, OUT] -> per-output-neuron v [L, 1, OUT]
    assert state.v["layers"]["mlp"]["up"]["kernel"].shape == (L, 1, OUT)
    # momentum stays full shape
    assert state.m["layers"]["mlp"]["up"]["kernel"].shape == (L, IN, OUT)
    grads = jax.grad(quadratic_loss)(params, target)
    updates, _ = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["lm_head"]["kernel"])).all()


def test_adam_mini_descends(problem):
    params, target = problem
    opt = optax.chain(
        custom_optim.scale_by_adam_mini(),
        optax.scale_by_learning_rate(0.05),
    )
    _, losses = run_steps(opt, params, target)
    assert losses[-1] < 0.2 * losses[0]


def test_muon_descends_on_stacked_layers(problem):
    params, target = problem
    opt = custom_optim.muon(0.02)
    _, losses = run_steps(opt, params, target, n=40)
    assert losses[-1] < 0.3 * losses[0]


def test_loraplus_ratio_moves_b_faster():
    lora = {
        "q": {"kernel": {"a": jnp.ones((8, 2)), "b": jnp.ones((2, 8)) * 0.5}},
    }
    opt = custom_optim.loraplus(0.01, lr_ratio=16.0)
    state = opt.init(lora)
    grads = jax.tree_util.tree_map(jnp.ones_like, lora)
    updates, _ = opt.update(grads, state, lora)
    a_step = np.abs(np.asarray(updates["q"]["kernel"]["a"])).mean()
    b_step = np.abs(np.asarray(updates["q"]["kernel"]["b"])).mean()
    # first adam step is lr * sign-ish -> ratio of magnitudes == lr ratio
    assert b_step / a_step == pytest.approx(16.0, rel=1e-3)


def test_make_optimizer_dispatch(problem):
    params, target = problem
    for name in ("galore", "apollo", "badam", "adam_mini", "muon"):
        cfg = OptimizerConfig(
            optimizer=name, learning_rate=0.05, schedule="constant",
            warmup_ratio=0.0, total_steps=10, galore_rank=4, apollo_rank=4,
        )
        opt, _ = make_optimizer(cfg)
        _, losses = run_steps(opt, params, target, n=10)
        assert np.isfinite(losses).all(), name
    cfg = OptimizerConfig(
        learning_rate=0.01, schedule="constant", warmup_ratio=0.0,
        total_steps=10, loraplus_lr_ratio=16.0,
    )
    opt, _ = make_optimizer(cfg)
    lora = {"q": {"kernel": {"a": jnp.ones((4, 2)), "b": jnp.zeros((2, 4))}}}
    state = opt.init(lora)
    grads = jax.tree_util.tree_map(jnp.ones_like, lora)
    updates, _ = opt.update(grads, state, lora)
    assert np.isfinite(np.asarray(updates["q"]["kernel"]["b"])).all()
