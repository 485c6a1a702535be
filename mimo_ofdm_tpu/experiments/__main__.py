"""CLI dispatcher: ``python -m mimo_ofdm_tpu.experiments <name> [--k v ...]``.

Flags map directly onto the experiment function's keyword arguments;
values are parsed as Python literals when possible (so ``--channels
'("los","rayleigh")'`` or ``--n-ant 32`` both work). Replaces the
reference's one-script-per-variant pattern and its ``vm_scripts`` runners
(``reference/vm_scripts/vm_runner.py``,
``reference/vm_scripts/main_mp_mrt_runner.py``)."""

from __future__ import annotations

import ast
import sys

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def run_grid(specs: list, stop_on_error: bool = False) -> int:
    """Run a batch of experiments sequentially, surviving individual
    failures — the headless-runner pattern of
    ``reference/vm_scripts/vm_runner.py:15-31`` (try/except per script)
    and ``main_mp_mrt_runner.py:15-21`` (parameter grids).

    ``specs``: list of ``(name, kwargs)`` pairs or ``{"name":..., **kw}``
    dicts."""
    failures = 0
    for spec in specs:
        if isinstance(spec, dict):
            name = spec.pop("name")
            kwargs = spec
        else:
            name, kwargs = spec
        print(f"=== running {name} {kwargs}")
        try:
            EXPERIMENTS[name](**kwargs)
        except Exception as e:  # noqa: BLE001 - runner must survive failures
            failures += 1
            print(f"!!! {name} failed: {e}")
            if stop_on_error:
                raise
    return failures


def main(argv=None):
    # compile once per machine, not once per process (utils/compile_cache)
    from mimo_ofdm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m mimo_ofdm_tpu.experiments <name> [--key value ...]")
        print("       python -m mimo_ofdm_tpu.experiments grid <specs.py-literal|@file>")
        print("experiments:")
        for name, fn in sorted(EXPERIMENTS.items()):
            doc = (fn.__doc__ or "").strip().splitlines()[0]
            print(f"  {name:20s} {doc}")
        return 0
    if argv[0] == "grid":
        arg = argv[1]
        if arg.startswith("@"):
            with open(arg[1:]) as f:
                specs = ast.literal_eval(f.read())
        else:
            specs = ast.literal_eval(arg)
        return run_grid(specs)
    name = argv[0]
    if name not in EXPERIMENTS:
        print(f"unknown experiment {name!r}; run with --help for the list")
        return 1
    kwargs = {}
    it = iter(argv[1:])
    for flag in it:
        if not flag.startswith("--"):
            print(f"expected --flag, got {flag!r}")
            return 1
        key = flag[2:].replace("-", "_")
        try:
            val = next(it)
        except StopIteration:
            val = "True"
        kwargs[key] = _parse_value(val)
    EXPERIMENTS[name](**kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
