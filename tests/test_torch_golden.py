"""Golden activation tests vs real torch semantics for the weight-port path.

The published binaries (s3fd.pth, torchvision densenet121) are unreachable
in this environment (no network), so the ports can't be validated against
them directly — but torch (cpu) is available, which is stronger than frozen
golden arrays: every layer-type the converters touch is checked by running
the *same weights* through torch and through the converted Flax layer and
comparing activations. This covers what the round-trip tests in
test_weight_ports.py cannot: that the OIHW→HWIO transpose, the explicit
padding convention, BatchNorm eps/running-stat semantics, and the L2Norm
formula all reproduce torch numerics, so a real checkpoint fed through
convert_torch_state_dict computes the same function it did in torch.

Reference layer inventory being validated:
- conv padding/stride/dilation variants used by S3FD
  (net_s3fd.py:22-129: 3x3 pad 1, fc6 3x3 pad 3, 1x1 pad 0, stride 2)
- L2Norm with learned per-channel scale (net_s3fd.py:6-19)
- DenseNet BN(eval)+ReLU+Conv composites and stride-2 avg-pool transitions
  (torchvision densenet121, referenced at lipreading/feature_extraction.py:23-28)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from lipreading_video_generation_tpu.models import densenet as dn  # noqa: E402
from lipreading_video_generation_tpu.models import s3fd as sf  # noqa: E402


def _to_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def _from_nhwc(y: jnp.ndarray) -> np.ndarray:
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize(
    "cin,cout,kernel,stride,padding,dilation",
    [
        (3, 8, 3, 1, 1, 1),    # VGG body conv
        (8, 16, 3, 2, 1, 1),   # conv6_2/conv7_2 stride-2
        (8, 16, 1, 1, 0, 1),   # fc7 / conv6_1 1x1
        (4, 8, 3, 1, 3, 1),    # fc6 pad-3 (net_s3fd.py:43)
        (4, 8, 3, 1, 2, 2),    # dilated variant
    ],
)
def test_conv2d_matches_torch(cin, cout, kernel, stride, padding, dilation):
    torch.manual_seed(0)
    m = torch.nn.Conv2d(cin, cout, kernel, stride=stride, padding=padding,
                        dilation=dilation)
    x = torch.randn(2, cin, 17, 19)
    with torch.no_grad():
        ref = m(x).numpy()

    # the converters' layout rule: OIHW → HWIO
    kernel_hwio = m.weight.detach().numpy().transpose(2, 3, 1, 0)
    flax_conv = nn.Conv(cout, (kernel, kernel), strides=stride, padding=padding,
                        kernel_dilation=dilation)
    params = {"kernel": jnp.asarray(kernel_hwio), "bias": jnp.asarray(m.bias.detach().numpy())}
    out = flax_conv.apply({"params": params}, _to_nhwc(x.numpy()))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


def test_l2norm_matches_torch_formula():
    # net_s3fd.py:6-19: x / sqrt(sum(x^2, dim=1)) * scale  (per channel)
    torch.manual_seed(1)
    x = torch.randn(2, 8, 5, 7)
    w = torch.rand(8) + 0.5
    norm = torch.sqrt(x.pow(2).sum(dim=1, keepdim=True)) + 1e-10
    ref = (x / norm * w.view(1, -1, 1, 1)).numpy()

    out = sf.L2Norm().apply({"params": {"weight": jnp.asarray(w.numpy())}},
                            _to_nhwc(x.numpy()))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)


def test_batchnorm_eval_matches_torch():
    torch.manual_seed(2)
    m = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        m.weight.copy_(torch.rand(6) + 0.5)
        m.bias.copy_(torch.randn(6))
        m.running_mean.copy_(torch.randn(6))
        m.running_var.copy_(torch.rand(6) + 0.1)
    m.eval()
    x = torch.randn(2, 6, 9, 9)
    with torch.no_grad():
        ref = m(x).numpy()

    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(m.weight.detach().numpy()),
                   "bias": jnp.asarray(m.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(m.running_mean.numpy()),
                        "var": jnp.asarray(m.running_var.numpy())},
    }
    out = bn.apply(variables, _to_nhwc(x.numpy()))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-5, rtol=1e-5)


def test_dense_layer_composite_matches_torch():
    """BN(eval)→ReLU→1x1 conv→BN→ReLU→3x3 conv + concat — the denselayer
    composite our DenseNet121 applies to converted torchvision weights."""
    torch.manual_seed(3)
    cin, growth = 10, 4
    bottleneck = 4 * growth  # torchvision's bn_size=4 bottleneck width
    bn1 = torch.nn.BatchNorm2d(cin).eval()
    conv1 = torch.nn.Conv2d(cin, bottleneck, 1, bias=False)
    bn2 = torch.nn.BatchNorm2d(bottleneck).eval()
    conv2 = torch.nn.Conv2d(bottleneck, growth, 3, padding=1, bias=False)
    with torch.no_grad():
        for bn in (bn1, bn2):
            bn.weight.copy_(torch.rand(bn.num_features) + 0.5)
            bn.bias.copy_(torch.randn(bn.num_features))
            bn.running_mean.copy_(torch.randn(bn.num_features))
            bn.running_var.copy_(torch.rand(bn.num_features) + 0.1)
    x = torch.randn(2, cin, 8, 8)
    with torch.no_grad():
        h = torch.relu(bn1(x))
        h = conv1(h)
        h = torch.relu(bn2(h))
        h = conv2(h)
        ref = torch.cat([x, h], dim=1).numpy()

    def bn_vars(bn):
        return (
            {"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())},
        )

    p1, s1 = bn_vars(bn1)
    p2, s2 = bn_vars(bn2)
    layer = dn._DenseLayer(growth=growth)
    variables = {
        "params": {
            "norm1": p1,
            "conv1": {"kernel": jnp.asarray(conv1.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "norm2": p2,
            "conv2": {"kernel": jnp.asarray(conv2.weight.detach().numpy().transpose(2, 3, 1, 0))},
        },
        "batch_stats": {"norm1": s1, "norm2": s2},
    }
    out = layer.apply(variables, _to_nhwc(x.numpy()), train=False)
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-5, rtol=1e-5)


def test_avgpool_transition_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(2, 6, 8, 8)
    ref = torch.nn.functional.avg_pool2d(x, 2, 2).numpy()
    out = nn.avg_pool(_to_nhwc(x.numpy()), (2, 2), strides=(2, 2))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)


def test_maxpool_matches_torch():
    torch.manual_seed(5)
    x = torch.randn(2, 4, 10, 10)
    ref = torch.nn.functional.max_pool2d(x, 2, 2).numpy()
    out = nn.max_pool(_to_nhwc(x.numpy()), (2, 2), strides=(2, 2))
    np.testing.assert_allclose(_from_nhwc(out), ref, atol=1e-6)


def test_linear_matches_torch():
    torch.manual_seed(6)
    m = torch.nn.Linear(12, 7)
    x = torch.randn(3, 12)
    with torch.no_grad():
        ref = m(x).numpy()
    out = nn.Dense(7).apply(
        {"params": {"kernel": jnp.asarray(m.weight.detach().numpy().T),
                    "bias": jnp.asarray(m.bias.detach().numpy())}},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
