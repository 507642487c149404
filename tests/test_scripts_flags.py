"""Lint the canonical shell recipes: every `--flag` in scripts/**/*.sh must
be accepted by the CLI module the script invokes — guards the recipes
against parser drift (the reference treats its scripts/ as the canonical
hyperparameter source, SURVEY §2 #27).
"""

import glob
import importlib
import os
import re

import pytest

SCRIPTS = sorted(glob.glob("scripts/**/*.sh", recursive=True))
CLI_RE = re.compile(r"python(?:3)? -m (omnitokenizer_tpu\.cli\.\w+)")
FLAG_RE = re.compile(r"(--[A-Za-z0-9_\-]+)")


def _commands(text):
    """Yield (cli_module, flags) per logical command (joins backslash
    continuations)."""
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        m = CLI_RE.search(line)
        if m:
            yield m.group(1), FLAG_RE.findall(line[m.end():])


def _parser_flags(cli_module):
    mod = importlib.import_module(cli_module)
    if hasattr(mod, "build_parser"):
        try:
            parser = mod.build_parser()
        except TypeError:
            parser = mod.build_parser(False)
    else:
        parser = mod.make_parser()  # pragma: no cover
    opts = set()
    for a in parser._actions:
        opts.update(a.option_strings)
    return opts


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.relpath(s, "scripts") for s in SCRIPTS])
def test_script_flags_are_accepted(script):
    with open(script) as f:
        text = f.read()
    cmds = list(_commands(text))
    if not cmds:
        pytest.skip(f"{script} invokes no omnitokenizer_tpu CLI (helper script)")
    for cli, flags in cmds:
        known = _parser_flags(cli)
        unknown = [f for f in flags if f not in known]
        assert not unknown, f"{script}: {cli} does not accept {unknown}"
