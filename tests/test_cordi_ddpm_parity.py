"""Cross-implementation parity for the Cordi DDPM math
(/root/reference/geotransformer/modules/cordi/ddpm.py:13-154).

The denoiser network itself deviates by design (the torch reference feeds
(B, S, E) to a pre-batch_first nn.TransformerEncoder, degenerating attention
to sequence length B=1 — documented in models/cordi.py); so these tests pin
a SHARED deterministic dummy net on both sides and verify everything around
it: the variance schedule coefficients, the closed-form q(x_t|x_0) epsilon
loss at fixed (t, e), the full reverse sampler with a fixed noise sequence,
and the sinusoidal time embedding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import torch_ref  # noqa: E402

torch_ref.ref_modules()

from geotransformer.modules.cordi.ddpm import (  # noqa: E402
    DiffusionPoint as TorchDiffusionPoint,
    SinusoidalPositionEmbeddings as TorchSinusoidalEmb,
    VarianceSchedule as TorchVarianceSchedule,
)

from ref_geotransformer_tpu.models.cordi import (  # noqa: E402
    SinusoidalTimeEmbedding,
    VarianceSchedule,
    ddpm_loss,
    ddpm_sample,
)

NUM_STEPS, BETA_1, BETA_T = 20, 1e-4, 0.02


def _dummy_net_np(x):
    return 0.5 * x + 0.1 * np.sin(3.0 * x)


class _TorchDummyNet(torch.nn.Module):
    """Shared elementwise epsilon-predictor; ignores time/context so the
    documented denoiser deviation is excluded from these tests."""

    def forward(self, x, t=None, ctx=None):
        return 0.5 * x + 0.1 * torch.sin(3.0 * x)


def _jax_dummy_net(x, t):
    return 0.5 * x + 0.1 * jnp.sin(3.0 * x)


@pytest.fixture(scope="module")
def scheds():
    return (
        VarianceSchedule(NUM_STEPS, BETA_1, BETA_T),
        TorchVarianceSchedule(NUM_STEPS, BETA_1, BETA_T),
    )


def test_variance_schedule_parity(scheds):
    """ddpm.py:23-44: padded betas, cumulative-log alpha_bars, flex/inflex sigmas."""
    ours, theirs = scheds
    for name in ("betas", "alphas", "alpha_bars", "sigmas_flex", "sigmas_inflex"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(theirs, name).numpy(),
            rtol=1e-6, atol=1e-6, err_msg=name,  # atol: fp32 cumprod rounding paths differ
        )


def test_get_loss_parity(scheds, monkeypatch):
    """ddpm.py:80-110 at explicit t and pinned e_rand."""
    ours_sched, torch_sched = scheds
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(3, 8, 12)).astype(np.float32)
    e = rng.normal(size=(3, 8, 12)).astype(np.float32)
    t = np.array([0, 7, NUM_STEPS - 1])

    dp = TorchDiffusionPoint(
        net=_TorchDummyNet(), var_sched=torch_sched, time_emb=torch.nn.Identity()
    )
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: torch.from_numpy(e.copy()))
    with torch.no_grad():
        theirs = dp.get_loss(torch.from_numpy(x0.copy()), ctx=None, t=torch.from_numpy(t))

    mine = ddpm_loss(ours_sched, _jax_dummy_net, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(e))
    np.testing.assert_allclose(float(mine), float(theirs), rtol=1e-5)


def test_reverse_sampler_parity(scheds, monkeypatch):
    """Full reverse loop ddpm.py:127-154 with a pinned noise sequence; runs
    the REFERENCE sample() itself (torch.full patched only to drop its
    hardcoded device='cuda', torch.randn_like patched to feed zs in order)."""
    ours_sched, torch_sched = scheds
    rng = np.random.default_rng(1)
    x_T = rng.normal(size=(2, 5, 7)).astype(np.float32)
    zs = rng.normal(size=(NUM_STEPS, 2, 5, 7)).astype(np.float32)

    dp = TorchDiffusionPoint(
        net=_TorchDummyNet(), var_sched=torch_sched, time_emb=torch.nn.Identity()
    )
    feed = iter(zs)
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: torch.from_numpy(next(feed).copy()))
    real_full = torch.full
    monkeypatch.setattr(
        torch, "full",
        lambda size, val, **kw: real_full(size, val, **{k: v for k, v in kw.items() if k != "device"}),
    )
    ctx = torch.zeros((2, 1))  # only ctx.size(0) is read by sample()
    with torch.no_grad():
        theirs = dp.sample(torch.from_numpy(x_T.copy()), ctx, flexibility=0.0)

    mine = ddpm_sample(ours_sched, _jax_dummy_net, jnp.asarray(x_T), jnp.asarray(zs), 0.0)
    np.testing.assert_allclose(np.asarray(mine), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_reverse_sampler_flexibility(scheds, monkeypatch):
    """get_sigmas blending (ddpm.py:50-53) at flexibility=0.7."""
    ours_sched, torch_sched = scheds
    for t in (1, 3, NUM_STEPS):
        np.testing.assert_allclose(
            float(ours_sched.get_sigmas(jnp.asarray(t), 0.7)),
            float(torch_sched.get_sigmas(torch.tensor(t), 0.7)),
            rtol=1e-6, atol=1e-6,  # fp32 sigmas_inflex rounding (see above)
        )


def test_time_embedding_parity():
    """SinusoidalPositionEmbeddings (ddpm.py:56-69) vs SinusoidalTimeEmbedding."""
    dim = 32
    t = np.array([0, 1, 5, 99])
    theirs = TorchSinusoidalEmb(dim)(torch.from_numpy(t)).numpy()
    mine = SinusoidalTimeEmbedding(dim).apply({}, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(mine), theirs, rtol=1e-5, atol=1e-6)
