"""Facilitator parity tests against a torch weight_norm reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from biom3_tpu.config import FacilitatorConfig
from biom3_tpu.io.convert import facilitator_params_from_torch
from biom3_tpu.models.facilitator import Facilitator, mmd_loss, mse_loss


@pytest.fixture(scope="module")
def torch_facilitator():
    import torch
    import torch.nn as nn
    from torch.nn.utils.weight_norm import weight_norm

    torch.manual_seed(0)
    model = nn.Sequential(
        weight_norm(nn.Linear(512, 1024), dim=None),
        nn.GELU(),
        nn.Dropout(0.0),
        weight_norm(nn.Linear(1024, 512), dim=None),
    )
    model.eval()
    return model


def test_forward_parity_with_torch(torch_facilitator, rng):
    import torch

    cfg = FacilitatorConfig()
    sd = {k: v.detach().numpy() for k, v in torch_facilitator.state_dict().items()}
    # torch's weight_norm keeps a materialized `weight` too; drop to mimic
    # the published .bin which stores weight_g/weight_v.
    sd = {k: v for k, v in sd.items() if not k.endswith(".weight")}
    params = facilitator_params_from_torch({"main." + k: v for k, v in sd.items()}, cfg)

    x = rng.standard_normal((5, 512)).astype(np.float32)
    with torch.no_grad():
        ref = torch_facilitator(torch.from_numpy(x)).numpy()
    out = Facilitator(cfg).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_mse_and_mmd_match_torch_formulas(rng):
    import torch

    x = rng.standard_normal((7, 512)).astype(np.float32)
    y = rng.standard_normal((7, 512)).astype(np.float32)

    tx, ty = torch.from_numpy(x), torch.from_numpy(y)

    def torch_kernel(a, b):
        a_size, b_size = a.shape[0], b.shape[0]
        dim = a.shape[1]
        a_core = a.view(a_size, 1, dim).expand(a_size, b_size, dim)
        b_core = b.view(1, b_size, dim).expand(a_size, b_size, dim)
        return torch.exp(-(a_core - b_core).pow(2).mean(2) / dim)

    ref_mmd = (
        torch_kernel(tx, tx).mean()
        + torch_kernel(ty, ty).mean()
        - 2 * torch_kernel(tx, ty).mean()
    ).item()
    ref_mse = torch.nn.functional.mse_loss(tx, ty).item()

    assert float(mmd_loss(jnp.asarray(x), jnp.asarray(y))) == pytest.approx(
        ref_mmd, abs=2e-6  # f32 accumulation-order noise
    )
    assert float(mse_loss(jnp.asarray(x), jnp.asarray(y))) == pytest.approx(
        ref_mse, rel=1e-6
    )


def test_facilitator_init_and_shapes():
    import jax

    cfg = FacilitatorConfig()
    model = Facilitator(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 512)))
    out = model.apply(params, jnp.ones((3, 512)))
    assert out.shape == (3, 512)
    # weight-norm invariant: scaling v leaves output unchanged
    scaled = jax.tree.map(lambda p: p, params)
    scaled["params"]["fc1"]["v"] = scaled["params"]["fc1"]["v"] * 3.0
    out2 = model.apply(scaled, jnp.ones((3, 512)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_facilitator_export_roundtrip(torch_facilitator):
    import torch
    from biom3_tpu.config import FacilitatorConfig
    from biom3_tpu.io.export import facilitator_params_to_torch

    cfg = FacilitatorConfig()
    sd0 = {
        "main." + k: v.detach().numpy()
        for k, v in torch_facilitator.state_dict().items()
        if not k.endswith(".weight")
    }
    params = facilitator_params_from_torch(sd0, cfg)
    sd = facilitator_params_to_torch(params, cfg)
    # loads into a fresh torch weight_norm model and reproduces outputs
    loaded = {
        k[len("main."):]: torch.from_numpy(np.array(v)) for k, v in sd.items()
    }  # the fixture is a bare nn.Sequential (no "main." wrapper)
    torch_facilitator.load_state_dict(loaded)
    x = np.random.default_rng(1).standard_normal((3, 512)).astype(np.float32)
    with torch.no_grad():
        ref = torch_facilitator(torch.from_numpy(x)).numpy()
    out = Facilitator(cfg).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
