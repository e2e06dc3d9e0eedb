"""CLI flag parity: flags AND semantics (default/type/choices/action).

Scans the reference sources (read-only checkout) for add_argument calls
— via ast, side-effect-free (reference main_kitti.py:10-13 runs pip at
import, main_3dident.py imports faiss at module scope) — and compares
against our parsers' registered options. Presence: every reference flag
must exist here. Semantics: for every shared flag, default value, type,
choices and store_true/false action must match, up to an explicit
allowlist of intentional deviations (VERDICT r2 #6)."""

import ast
import os
import re

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

# flag -> reason, for deliberate semantic deviations (documented in
# PARITY.md "Deviations"); presence-parity still enforced
ALLOWED_DEVIATIONS = {
    # reference main_3dident.py:104 lists choice "rn151" but its own
    # encoder dict (:290-293) has no such key — selecting it would
    # KeyError. We accept the flag value and map it to ResNet152.
    "--encoder": "rn151 choice is a reference bug (KeyError); kept, mapped "
                 "to ResNet152",
}


def _ref_flags(path):
    src = open(path).read()
    return set(re.findall(r"add_argument\(\s*[\"'](--[\w-]+)[\"']", src))


def _ref_specs(path):
    """flag -> {default, type, choices, action} from ast (literal values
    only; non-literal defaults are skipped)."""
    tree = ast.parse(open(path).read())
    specs = {}
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "add_argument"
            and node.args
            and isinstance(node.args[0], ast.Constant)
            and str(node.args[0].value).startswith("--")
        ):
            continue
        spec = {}
        for kw in node.keywords:
            if kw.arg == "default":
                try:
                    spec["default"] = ast.literal_eval(kw.value)
                except ValueError:
                    pass
            elif kw.arg == "type" and isinstance(kw.value, ast.Name):
                spec["type"] = kw.value.id
            elif kw.arg == "choices":
                try:
                    spec["choices"] = set(ast.literal_eval(kw.value))
                except ValueError:
                    pass
            elif kw.arg == "action" and isinstance(kw.value, ast.Constant):
                spec["action"] = kw.value.value
        specs[node.args[0].value] = spec
    return specs


def _our_specs(parser):
    import argparse

    specs = {}
    for action in parser._actions:
        for opt in action.option_strings:
            if not opt.startswith("--"):
                continue
            spec = {"default": action.default}
            if action.type is not None:
                spec["type"] = getattr(action.type, "__name__", str(action.type))
            if action.choices is not None:
                spec["choices"] = set(action.choices)
            if isinstance(action, argparse._StoreTrueAction):
                spec["action"] = "store_true"
            elif isinstance(action, argparse._StoreFalseAction):
                spec["action"] = "store_false"
            specs[opt] = spec
    return specs


def _compare_semantics(ref_specs, our_specs, driver):
    errors = []
    for flag, ref in sorted(ref_specs.items()):
        if flag in ALLOWED_DEVIATIONS or flag not in our_specs:
            continue  # missing flags are caught by the presence tests
        ours = our_specs[flag]
        if "default" in ref and ref["default"] != ours.get("default"):
            errors.append(
                f"{driver} {flag}: default {ours.get('default')!r} != "
                f"reference {ref['default']!r}"
            )
        if "type" in ref and ref["type"] != ours.get("type"):
            errors.append(
                f"{driver} {flag}: type {ours.get('type')} != "
                f"reference {ref['type']}"
            )
        if "choices" in ref and ref["choices"] != ours.get("choices"):
            errors.append(
                f"{driver} {flag}: choices {ours.get('choices')} != "
                f"reference {ref['choices']}"
            )
        if "action" in ref and ref["action"] != ours.get("action"):
            errors.append(
                f"{driver} {flag}: action {ours.get('action')} != "
                f"reference {ref['action']}"
            )
    assert not errors, "\n".join(errors)


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


def _capture_mlp_parser():
    import argparse
    import unittest.mock as mock

    import cl_ica_tpu.cli.main_mlp as m

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, argv=None):
        captured["parser"] = self
        return orig(self, [])

    with mock.patch.object(argparse.ArgumentParser, "parse_args", fake):
        m.parse_args([])
    return captured["parser"]


def _capture_3dident_parser():
    import argparse
    import unittest.mock as mock

    import cl_ica_tpu.cli.main_3dident as m

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
    return captured["parser"]


def test_main_mlp_flag_semantics():
    _compare_semantics(
        _ref_specs(os.path.join(REF, "main_mlp.py")),
        _our_specs(_capture_mlp_parser()),
        "main_mlp",
    )


def test_main_3dident_flag_semantics():
    _compare_semantics(
        _ref_specs(os.path.join(REF, "main_3dident.py")),
        _our_specs(_capture_3dident_parser()),
        "main_3dident",
    )


def test_main_kitti_flag_semantics():
    from cl_ica_tpu.cli.main_kitti import build_parser

    _compare_semantics(
        _ref_specs(os.path.join(REF, "main_kitti.py")),
        _our_specs(build_parser()),
        "main_kitti",
    )
