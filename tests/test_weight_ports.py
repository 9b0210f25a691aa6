"""Weight-port mapping tests: synthesize a torch-layout state_dict from the
Flax params (inverting the mapping), convert, and check exact round-trip.
Proves the s3fd.pth / torchvision-densenet121 port paths are shape- and
layout-correct without needing the binary checkpoints."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lipreading_video_generation_tpu.models import densenet as dn
from lipreading_video_generation_tpu.models import s3fd as sf


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def test_s3fd_state_dict_roundtrip():
    model = sf.S3FD()
    params = model.init(jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32))["params"]
    # synthesize the torch layout: conv kernels HWIO→OIHW under "<mod>.weight"
    state_dict = {}
    for mod, leaves in params.items():
        for leaf, val in leaves.items():
            val = np.asarray(val)
            if leaf == "kernel":
                state_dict[f"{mod}.weight"] = val.transpose(3, 2, 0, 1)
            elif leaf == "weight":  # L2Norm scale
                state_dict[f"{mod}.weight"] = val
            elif leaf == "bias":
                state_dict[f"{mod}.bias"] = val
    converted = sf.convert_torch_state_dict(state_dict)
    flat_a = _flatten(params)
    flat_b = _flatten(converted)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


@pytest.mark.slow
def test_densenet_state_dict_roundtrip():
    model = dn.DenseNet121()
    variables = model.init(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))
    params, stats = variables["params"], variables["batch_stats"]

    # invert map_name: build torchvision-style keys
    def torch_mod(flax_mod, sub=None):
        if flax_mod.startswith("block"):
            bi, li = flax_mod[len("block"):].split("_layer")
            return f"features.denseblock{int(bi)+1}.denselayer{int(li)+1}.{sub}"
        if flax_mod.startswith("transition"):
            return f"features.transition{int(flax_mod[len('transition'):])+1}.{sub}"
        if flax_mod == "norm_final":
            return "features.norm5"
        return f"features.{flax_mod}"

    state_dict = {}
    for mod, leaves in params.items():
        for sub, subleaves in (leaves.items() if any(
                isinstance(v, dict) for v in leaves.values()) else [(None, leaves)]):
            if isinstance(subleaves, dict) and any(isinstance(v, dict) for v in subleaves.values()):
                pytest.fail("unexpected nesting")
            base = torch_mod(mod, sub) if sub else torch_mod(mod)
            for leaf, val in (subleaves.items() if sub else leaves.items()):
                if isinstance(val, dict):
                    continue
                val = np.asarray(val)
                if leaf == "kernel":
                    state_dict[f"{base}.weight"] = val.transpose(3, 2, 0, 1)
                elif leaf == "scale":
                    state_dict[f"{base}.weight"] = val
                elif leaf == "bias":
                    state_dict[f"{base}.bias"] = val
    for mod, leaves in stats.items():
        for sub, subleaves in (leaves.items() if any(
                isinstance(v, dict) for v in leaves.values()) else [(None, leaves)]):
            base = torch_mod(mod, sub) if sub else torch_mod(mod)
            for leaf, val in (subleaves.items() if sub else leaves.items()):
                if isinstance(val, dict):
                    continue
                if leaf == "mean":
                    state_dict[f"{base}.running_mean"] = np.asarray(val)
                elif leaf == "var":
                    state_dict[f"{base}.running_var"] = np.asarray(val)

    cparams, cstats = dn.convert_torch_state_dict(state_dict)
    fa, fb = _flatten(params), _flatten(cparams)
    assert set(fb) <= set(fa)
    # every converted leaf matches the original
    for k in fb:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)
    # all conv/norm leaves were covered
    missing = set(fa) - set(fb)
    assert not missing, f"unmapped params: {sorted(missing)[:5]}"
    sa, sb = _flatten(stats), _flatten(cstats)
    assert set(sa) == set(sb)
    for k in sb:
        np.testing.assert_array_equal(sa[k], sb[k], err_msg=k)
