"""Flag-coverage audit: every flag the REFERENCE parsers define
(base.VQGAN + omnitokenizer.VQGAN + VideoData for the tokenizer;
Net2NetTransformer + VideoData for the LM) must be accepted by our CLI
parsers — users porting shell recipes must not hit unknown-argument errors.

Allowlisted: flags that are dead in the reference itself.
"""

import argparse
import sys

import pytest

sys.path.insert(0, "tests")
from reference_oracle import install_data_stubs, ref_module  # noqa: E402

# dead in the reference: --i3d_feat is parsed (omnitokenizer.py parser) but
# never read anywhere (the video_perceptual_model path is commented out)
ALLOW = {"--i3d_feat"}


def _flags(parser):
    return {o for a in parser._actions for o in a.option_strings
            if o.startswith("--")}


@pytest.fixture(scope="module")
def ref_parsers():
    install_data_stubs()
    dmod = ref_module("data")
    base = ref_module("base")
    om = ref_module("omnitokenizer")
    lm = ref_module("lm_transformer")

    pvq = argparse.ArgumentParser(add_help=False)
    pvq = base.VQGAN.add_model_specific_args(pvq)
    pvq = om.VQGAN.add_model_specific_args(pvq)
    pvq = dmod.VideoData.add_data_specific_args(pvq)

    plm = argparse.ArgumentParser(add_help=False)
    plm = lm.Net2NetTransformer.add_model_specific_args(plm)
    plm = dmod.VideoData.add_data_specific_args(plm)
    return _flags(pvq), _flags(plm)


def test_vqgan_train_covers_reference_flags(ref_parsers):
    from omnitokenizer_tpu.cli import vqgan_train

    missing = ref_parsers[0] - _flags(vqgan_train.build_parser()) - ALLOW
    assert not missing, f"vqgan_train missing reference flags: {sorted(missing)}"


def test_transformer_train_covers_reference_flags(ref_parsers):
    from omnitokenizer_tpu.cli import transformer_train

    missing = ref_parsers[1] - _flags(transformer_train.build_parser()) - ALLOW
    assert not missing, f"transformer_train missing reference flags: {sorted(missing)}"


@pytest.mark.parametrize("script", ["vqgan_train", "vqgan_eval",
                                    "transformer_train", "transformer_eval"])
def test_cli_scripts_cover_reference_script_flags(script):
    """Flags added directly in the reference's top-level CLI scripts
    (text-scraped — the scripts execute at import) must also parse here."""
    import importlib
    import re

    text = open(f"/root/reference/{script}.py").read()
    ref = set(re.findall(r"add_argument\(['\"](--[a-z_0-9]+)['\"]", text))
    mod = importlib.import_module(f"omnitokenizer_tpu.cli.{script}")
    ours = _flags(mod.build_parser())
    missing = ref - ours - ALLOW
    assert not missing, f"{script} missing reference flags: {sorted(missing)}"
