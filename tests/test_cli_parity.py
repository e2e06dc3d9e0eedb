"""CLI flag parity: every reference driver flag must exist here.

Scans the reference sources (read-only checkout) for add_argument calls
and compares against our parsers' registered options."""

import os
import re

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _ref_flags(path):
    src = open(path).read()
    return set(re.findall(r"add_argument\(\s*[\"'](--[\w-]+)[\"']", src))


def _our_flags(parser):
    flags = set()
    for action in parser._actions:
        for opt in action.option_strings:
            if opt.startswith("--"):
                flags.add(opt)
    return flags


def test_main_mlp_flags():
    from cl_ica_tpu.cli.main_mlp import parse_args  # noqa: F401
    import argparse

    # build our parser by intercepting parse_args
    import cl_ica_tpu.cli.main_mlp as m

    ref = _ref_flags(os.path.join(REF, "main_mlp.py"))
    parser = argparse.ArgumentParser()
    # re-create via parse_args on empty argv is destructive; instead
    # instantiate through the module's parser construction
    import unittest.mock as mock

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, argv=None):
        captured["parser"] = self
        return orig(self, [])

    with mock.patch.object(argparse.ArgumentParser, "parse_args", fake):
        m.parse_args([])
    ours = _our_flags(captured["parser"])
    missing = ref - ours
    assert not missing, f"missing reference flags: {missing}"


def test_main_3dident_flags():
    import argparse
    import unittest.mock as mock

    import cl_ica_tpu.cli.main_3dident as m

    ref = _ref_flags(os.path.join(REF, "main_3dident.py"))
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, argv=None):
        captured["parser"] = self
        return orig(self, ["--offline-dataset", "/tmp"])

    with mock.patch.object(argparse.ArgumentParser, "parse_args", fake):
        try:
            m.parse_args(["--offline-dataset", "/tmp"])
        except (AssertionError, SystemExit):
            pass
    ours = _our_flags(captured["parser"])
    missing = ref - ours
    assert not missing, f"missing reference flags: {missing}"


def test_main_kitti_flags():
    from cl_ica_tpu.cli.main_kitti import build_parser

    ref = _ref_flags(os.path.join(REF, "main_kitti.py"))
    ours = _our_flags(build_parser())
    missing = ref - ours
    assert not missing, f"missing reference flags: {missing}"
