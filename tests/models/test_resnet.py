import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from boxdreamer_tpu.models.resnet import ResNet, ResNetConfig, convert_torchvision_resnet


def test_resnet18_token_shape():
    model = ResNet(ResNetConfig("resnet18", dtype="float32"))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 4, 512)  # 64/32 = 2x2 tokens
    assert np.isfinite(np.asarray(out)).all()


def test_resnet50_channels():
    model = ResNet(ResNetConfig("resnet50", dtype="float32"))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 4, 2048)


def test_torchvision_weight_parity():
    try:
        from torchvision.models import resnet18
    except Exception:
        pytest.skip("torchvision not available")
    tm = resnet18(weights=None).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = ResNetConfig("resnet18", dtype="float32")
    converted = convert_torchvision_resnet(sd, cfg)

    x = torch.rand(1, 3, 64, 64)
    # torchvision forward up to layer4 with ImageNet normalization applied
    # to match our encoder contract.
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xn = (x - mean) / std
    with torch.no_grad():
        y = tm.conv1(xn)
        y = tm.bn1(y)
        y = tm.relu(y)
        y = tm.maxpool(y)
        y = tm.layer1(y)
        y = tm.layer2(y)
        y = tm.layer3(y)
        y = tm.layer4(y)  # (1, 512, 2, 2)
    ref = y.permute(0, 2, 3, 1).reshape(1, 4, 512).numpy()

    model = ResNet(cfg)
    out = model.apply(converted, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
