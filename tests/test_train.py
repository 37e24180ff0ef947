"""Training-step tests mirroring the reference's 'training occurred' doctests
(srgan_train.py:1100-1122, 1190-1212) plus end-to-end epoch behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.config import (
    DiscriminatorConfig,
    GeneratorConfig,
    LossConfig,
    TrainConfig,
)
from deepbedmap_tpu.data.dataset import TileDataset, epoch_batches, train_dev_split
from deepbedmap_tpu.models.discriminator import Discriminator
from deepbedmap_tpu.models.generator import Generator
from deepbedmap_tpu.train import create_gan_state, fit, make_train_step
from deepbedmap_tpu.train.loop import make_epoch_fns
from deepbedmap_tpu.train.steps import make_eval_step

TINY_G = GeneratorConfig(num_residual_blocks=1)
TINY_T = TrainConfig(batch_size=2, learning_rate=1e-3)


@pytest.fixture(scope="module")
def setup():
    g_model = Generator(TINY_G)
    d_model = Discriminator(DiscriminatorConfig())
    state = create_gan_state(TINY_G, t_cfg=TINY_T)
    dataset = TileDataset.synthetic(8, seed=0)
    return g_model, d_model, state, dataset


def _leaf_diff(a, b):
    return any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


@pytest.mark.slow
def test_train_step_updates_both_models(setup):
    g_model, d_model, state, dataset = setup
    step = jax.jit(make_train_step(g_model, d_model, TINY_T))
    batch = dataset.take(jnp.arange(2))
    new_state, metrics = step(state, batch)

    assert _leaf_diff(new_state.g_params, state.g_params)
    assert _leaf_diff(new_state.d_params, state.d_params)
    assert _leaf_diff(new_state.d_batch_stats, state.d_batch_stats)
    assert int(new_state.step) == int(state.step) + 1
    for name, value in vars(metrics).items():
        assert np.isfinite(float(value)), name


def test_eval_step_is_pure(setup):
    g_model, d_model, state, dataset = setup
    ev = jax.jit(make_eval_step(g_model, d_model))
    batch = dataset.take(jnp.arange(2))
    m1 = ev(state, batch)
    m2 = ev(state, batch)
    assert float(m1.generator_loss) == float(m2.generator_loss)


@pytest.mark.slow
def test_nondifferentiable_adversarial_parity(setup):
    """Reference parity: with the default (detached) adversarial term, the
    generator gradient must be identical whether the adversarial weight is
    0 or huge — it carries no gradient (srgan_train.py:1229-1233)."""
    g_model, d_model, state, dataset = setup
    batch = dataset.take(jnp.arange(2))

    def g_grad(loss_cfg):
        step = make_train_step(g_model, d_model, TINY_T, loss_cfg)
        new_state, _ = jax.jit(step)(state, batch)
        return new_state.g_params

    p_small = g_grad(LossConfig(adversarial_weight=0.0))
    p_big = g_grad(LossConfig(adversarial_weight=1e6))
    for a, b in zip(
        jax.tree_util.tree_leaves(p_small), jax.tree_util.tree_leaves(p_big)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_differentiable_adversarial_changes_gradient(setup):
    from deepbedmap_tpu.train.steps import make_g_loss_fn

    g_model, d_model, state, dataset = setup
    batch = dataset.take(jnp.arange(2))

    def g_grads(cfg):
        loss_fn = make_g_loss_fn(g_model, d_model, cfg)
        grads, _ = jax.grad(loss_fn, has_aux=True)(
            state.g_params, state.d_params, state.d_batch_stats, batch
        )
        return grads

    # isolate the adversarial term: zero every other weight
    only_adv = dict(
        content_weight=0.0, topographic_weight=0.0, structural_weight=0.0,
        adversarial_weight=1.0,
    )
    ref = g_grads(LossConfig(**only_adv))  # detached (reference quirk): zero grad
    assert all(
        float(jnp.abs(g).max()) == 0.0 for g in jax.tree_util.tree_leaves(ref)
    )
    diff = g_grads(LossConfig(**only_adv, differentiable_adversarial=True))
    assert any(
        float(jnp.abs(g).max()) > 0.0 for g in jax.tree_util.tree_leaves(diff)
    )


@pytest.mark.slow
def test_epoch_scan_and_fit(setup):
    g_model, d_model, state, dataset = setup
    t_cfg = TrainConfig(batch_size=2, learning_rate=1e-4, train_fraction=0.75)
    state = create_gan_state(TINY_G, t_cfg=t_cfg)
    state, history = fit(
        state, dataset, g_model, d_model, t_cfg=t_cfg, epochs=2
    )
    assert len(history) == 2
    for record in history:
        for key, value in record.items():
            assert np.isfinite(value), key
    assert int(state.step) == 2 * 3  # 6 train tiles / batch 2 = 3 steps/epoch
    assert "val_generator_psnr" in history[0]


@pytest.mark.slow
def test_fit_callback_stops(setup):
    g_model, d_model, _, dataset = setup
    t_cfg = TrainConfig(batch_size=2, train_fraction=0.75)
    state = create_gan_state(TINY_G, t_cfg=t_cfg)
    state, history = fit(
        state,
        dataset,
        g_model,
        d_model,
        t_cfg=t_cfg,
        epochs=5,
        callback=lambda epoch, rec: epoch >= 1,  # prune after 2 epochs
    )
    assert len(history) == 2


def test_split_is_reference_shaped():
    train_idx, dev_idx = train_dev_split(3826)
    assert len(train_idx) == 3634 and len(dev_idx) == 192
    assert len(np.intersect1d(train_idx, dev_idx)) == 0
    batches = epoch_batches(train_idx, 128, np.random.RandomState(0))
    assert batches.shape == (28, 128)


@pytest.mark.slow
def test_remat_generator_trains(setup):
    """jax.checkpoint'd trunk: gradients flow, params match non-remat to fp32
    tolerance after one step."""
    g_model_r = Generator(GeneratorConfig(num_residual_blocks=1, remat=True))
    g_model, d_model, state, dataset = setup
    batch = dataset.take(jnp.arange(2))
    step_r = jax.jit(make_train_step(g_model_r, d_model, TINY_T))
    step_n = jax.jit(make_train_step(g_model, d_model, TINY_T))
    s_r, m_r = step_r(state, batch)
    s_n, m_n = step_n(jax.tree_util.tree_map(jnp.copy, state), batch)
    np.testing.assert_allclose(
        float(m_r.generator_loss), float(m_n.generator_loss), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_r.g_params),
        jax.tree_util.tree_leaves(s_n.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(
    not __import__("os").environ.get("DBMT_SLOW"),
    reason="slow learnability test; set DBMT_SLOW=1",
)
def test_generator_learns_synthetic_sr_task():
    """Learnability: on a dataset where Y is a deterministic function of X
    (bilinear 4x upsample), content loss must drop substantially over a few
    epochs — evidence the training dynamics (losses, optimizers, BN) work."""
    import jax.image

    rs = np.random.RandomState(0)
    n = 32
    X = rs.rand(n, 1, 11, 11).astype(np.float32)
    Y = np.stack(
        [
            np.asarray(
                jax.image.resize(jnp.asarray(x[0, 1:-1, 1:-1]), (36, 36), "linear")
            )[None]
            for x in X
        ]
    )
    arrays = {
        "X": X,
        "W1": np.zeros((n, 1, 110, 110), np.float32),
        "W2": np.zeros((n, 2, 22, 22), np.float32),
        "W3": np.zeros((n, 1, 11, 11), np.float32),
        "Y": Y,
    }
    dataset = TileDataset.from_nchw(arrays)
    t_cfg = TrainConfig(batch_size=8, learning_rate=1e-3, train_fraction=0.75)
    g_cfg = GeneratorConfig(num_residual_blocks=1)
    g_model, d_model = Generator(g_cfg), Discriminator(DiscriminatorConfig())
    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    state, history = fit(state, dataset, g_model, d_model, t_cfg=t_cfg, epochs=8)
    first, last = history[0]["generator_loss"], history[-1]["generator_loss"]
    assert last < 0.6 * first, (first, last)


def test_cosine_lr_schedule_values():
    """make_lr('cosine'): warmup to peak, cosine down to lr*final_scale."""
    from deepbedmap_tpu.train.state import make_lr

    cfg = TrainConfig(
        learning_rate=2e-4,
        lr_schedule="cosine",
        lr_total_steps=100,
        lr_warmup_steps=10,
        lr_final_scale=0.1,
    )
    sched = make_lr(cfg)
    assert float(sched(0)) < 1e-6  # warmup start
    np.testing.assert_allclose(float(sched(10)), 2e-4, rtol=1e-6)  # peak
    np.testing.assert_allclose(float(sched(100)), 2e-5, rtol=1e-5)  # floor
    assert float(sched(55)) < 2e-4  # decaying


def test_ema_tracks_generator(setup):
    """With ema_decay on: g_ema = decay*ema + (1-decay)*params per step,
    lagging the live params; checkpoint round-trips the EMA tree."""
    import tempfile

    from deepbedmap_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    g_model, d_model, _, dataset = setup
    t_cfg = TrainConfig(batch_size=4, learning_rate=1e-3, ema_decay=0.9)
    state = create_gan_state(TINY_G, t_cfg=t_cfg)
    assert state.g_ema is not None
    step = jax.jit(make_train_step(g_model, d_model, t_cfg))
    batch = dataset.take(jnp.arange(4))

    p0 = jax.tree_util.tree_map(jnp.copy, state.g_params)
    state, _ = step(state, batch)
    # hand-check one leaf: ema = 0.9*p0 + 0.1*p1
    leaf0 = jax.tree_util.tree_leaves(p0)[0]
    leaf1 = jax.tree_util.tree_leaves(state.g_params)[0]
    leafe = jax.tree_util.tree_leaves(state.g_ema)[0]
    np.testing.assert_allclose(
        np.asarray(leafe), 0.9 * np.asarray(leaf0) + 0.1 * np.asarray(leaf1),
        rtol=1e-5, atol=1e-8,
    )

    # EMA lags the live params
    state, _ = step(state, batch)
    diff = sum(
        float(jnp.abs(e - p).sum())
        for e, p in zip(
            jax.tree_util.tree_leaves(state.g_ema),
            jax.tree_util.tree_leaves(state.g_params),
        )
    )
    assert diff > 0

    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(state, f"{d}/ck")
        template = create_gan_state(TINY_G, t_cfg=t_cfg)
        back = restore_checkpoint(f"{d}/ck", template)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.g_ema),
            jax.tree_util.tree_leaves(back.g_ema),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_instance_noise_changes_d_update_only():
    """LossConfig.d_instance_noise perturbs the discriminator update
    (real/fake overlap, benchmarks/train_gan_health.py) but must leave the
    generator's loss inputs untouched and keep the step deterministic in
    state.step (pure (state, batch) function)."""
    import jax
    import jax.numpy as jnp

    from deepbedmap_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state, make_train_step

    g_cfg = GeneratorConfig(num_residual_blocks=1)
    t_cfg = TrainConfig(batch_size=4)
    g, d = Generator(g_cfg), Discriminator(DiscriminatorConfig())
    batch = TileDataset.synthetic(4, seed=0).take(jnp.arange(4))
    s0 = create_gan_state(g_cfg, t_cfg=t_cfg)

    plain = jax.jit(make_train_step(g, d, t_cfg, LossConfig()))
    noisy = jax.jit(make_train_step(g, d, t_cfg, LossConfig(d_instance_noise=0.5)))

    _, m_plain = plain(s0, batch)
    s_noisy, m_noisy = noisy(s0, batch)
    # the D update sees different inputs...
    assert float(m_plain.discriminator_loss) != float(m_noisy.discriminator_loss)
    import numpy as np

    assert np.isfinite(float(m_noisy.generator_loss))
    # ...and the step is deterministic: same state+batch -> same metrics
    _, m_again = noisy(s0, batch)
    assert float(m_again.discriminator_loss) == float(m_noisy.discriminator_loss)
    # successive steps draw fresh noise (key folds in state.step)
    _, m_next = noisy(s_noisy, batch)
    assert float(m_next.discriminator_loss) != float(m_noisy.discriminator_loss)


def test_instance_noise_half_life_anneals_to_zero():
    """instance_noise_half_life_steps decays sigma inside the jitted graph:
    at step 0 the D update differs from the noise-free step, while after many
    half-lives (sigma * 2^-40) it converges to it — same compiled function,
    sigma traced from state.step (benchmarks/train_gan_health.py schedule)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepbedmap_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state, make_train_step

    g_cfg = GeneratorConfig(num_residual_blocks=1)
    t_cfg = TrainConfig(batch_size=4)
    g, d = Generator(g_cfg), Discriminator(DiscriminatorConfig())
    batch = TileDataset.synthetic(4, seed=0).take(jnp.arange(4))
    s0 = create_gan_state(g_cfg, t_cfg=t_cfg)
    s_late = s0.replace(step=jnp.asarray(40, dtype=s0.step.dtype))

    plain = jax.jit(make_train_step(g, d, t_cfg, LossConfig()))
    annealed = jax.jit(
        make_train_step(
            g, d, t_cfg,
            LossConfig(d_instance_noise=0.5, instance_noise_half_life_steps=1.0),
        )
    )

    _, m_plain0 = plain(s0, batch)
    _, m_ann0 = annealed(s0, batch)
    assert float(m_plain0.discriminator_loss) != float(m_ann0.discriminator_loss)

    _, m_plain_late = plain(s_late, batch)
    _, m_ann_late = annealed(s_late, batch)
    np.testing.assert_allclose(
        float(m_ann_late.discriminator_loss),
        float(m_plain_late.discriminator_loss),
        rtol=1e-6,
    )


def test_d_lr_scale_slows_discriminator_only():
    """TrainConfig.d_lr_scale runs the discriminator's Adam at a scaled
    alpha (inverted TTUR, benchmarks/train_gan_health.py): 0 freezes D
    while G still updates; 1 is bit-identical to the shared-alpha default;
    the scaled schedule path multiplies through make_lr."""
    g_cfg = GeneratorConfig(num_residual_blocks=1)
    batch = TileDataset.synthetic(4, seed=0).take(jnp.arange(4))

    frozen_t = TrainConfig(batch_size=4, d_lr_scale=0.0)
    g, d = Generator(g_cfg), Discriminator(DiscriminatorConfig())
    s0 = create_gan_state(g_cfg, t_cfg=frozen_t)
    s1, _ = jax.jit(make_train_step(g, d, frozen_t))(s0, batch)
    assert not _leaf_diff(s1.d_params, s0.d_params)  # D frozen
    assert _leaf_diff(s1.g_params, s0.g_params)  # G still learns

    default_t = TrainConfig(batch_size=4)
    explicit_t = TrainConfig(batch_size=4, d_lr_scale=1.0)
    sa, _ = jax.jit(make_train_step(g, d, default_t))(s0, batch)
    sb, _ = jax.jit(make_train_step(g, d, explicit_t))(s0, batch)
    assert not _leaf_diff(sa.d_params, sb.d_params)

    from deepbedmap_tpu.train.state import make_optimizer

    sched_cfg = TrainConfig(
        learning_rate=2e-4,
        lr_schedule="cosine",
        lr_total_steps=100,
        d_lr_scale=0.25,
    )
    tx_d = make_optimizer(sched_cfg, lr_scale=sched_cfg.d_lr_scale)
    tx = make_optimizer(sched_cfg)
    grads = {"w": jnp.ones((3,))}
    upd_d, _ = tx_d.update(grads, tx_d.init(grads), grads)
    upd, _ = tx.update(grads, tx.init(grads), grads)
    np.testing.assert_allclose(
        np.asarray(upd_d["w"]), 0.25 * np.asarray(upd["w"]), rtol=1e-6
    )
