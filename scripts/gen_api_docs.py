"""Generate per-module API reference docs (Markdown) from docstrings.

The reference ships Sphinx autosummary API docs
(``reference/docs/source/api.rst`` — one page per module). Sphinx is not
available in this environment, so this generator renders the same
information (module docstring, public classes/functions with signatures and
docstrings) to ``docs/api/*.md`` + an index, using only the stdlib. Re-run
after changing public APIs:

    python scripts/gen_api_docs.py
"""

import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

PACKAGE = "mimo_ofdm_tpu"


def iter_modules():
    pkg = importlib.import_module(PACKAGE)
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        name = info.name
        if name.rsplit(".", 1)[-1].startswith("_"):
            continue
        yield name


def fmt_sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def indent_doc(doc):
    return inspect.cleandoc(doc) if doc else "*(no docstring)*"


def document_module(name):
    mod = importlib.import_module(name)
    lines = [f"# `{name}`", ""]
    lines += [indent_doc(mod.__doc__), ""]

    members = [(n, o) for n, o in vars(mod).items()
               if not n.startswith("_") and getattr(o, "__module__", None) == name]
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    funcs = [(n, o) for n, o in members if inspect.isfunction(o)]
    consts = [(n, o) for n, o in vars(mod).items()
              if not n.startswith("_") and n.isupper()
              and not inspect.ismodule(o) and not callable(o)]

    if consts:
        lines += ["## Constants", ""]
        for n, o in consts:
            rep = repr(o)
            rep = rep if len(rep) <= 80 else rep[:77] + "..."
            lines += [f"- `{n} = {rep}`"]
        lines += [""]

    for n, cls in classes:
        lines += [f"## class `{n}`", "", indent_doc(cls.__doc__), ""]
        fields = getattr(cls, "__dataclass_fields__", None)
        if fields:
            lines += ["Fields:", ""]
            for fname, f in fields.items():
                tp = f.type if isinstance(f.type, str) else getattr(
                    f.type, "__name__", str(f.type))
                lines += [f"- `{fname}: {tp}`"]
            lines += [""]
        # NamedTuple fields
        elif getattr(cls, "_fields", None):
            lines += ["Fields: " + ", ".join(f"`{f}`" for f in cls._fields), ""]
        for mname, meth in inspect.getmembers(cls, inspect.isfunction):
            if mname.startswith("_") or meth.__qualname__.split(".")[0] != n:
                continue
            lines += [f"### `{n}.{mname}{fmt_sig(meth)}`", "",
                      indent_doc(meth.__doc__), ""]

    for n, fn in funcs:
        lines += [f"## `{n}{fmt_sig(fn)}`", "", indent_doc(fn.__doc__), ""]

    return "\n".join(lines) + "\n"


def main():
    out_dir = os.path.join(ROOT, "docs", "api")
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(iter_modules())
    index = ["# API reference", "",
             f"Generated from docstrings by `scripts/gen_api_docs.py` "
             f"(the Markdown equivalent of the reference's Sphinx API pages, "
             f"`reference/docs/source/api.rst`).", ""]
    for name in names:
        short = name[len(PACKAGE) + 1:].replace(".", "_")
        path = os.path.join(out_dir, short + ".md")
        with open(path, "w") as f:
            f.write(document_module(name))
        mod = importlib.import_module(name)
        first = (inspect.cleandoc(mod.__doc__).splitlines()[0]
                 if mod.__doc__ else "")
        index += [f"- [`{name}`]({short}.md) — {first}"]
    with open(os.path.join(out_dir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(names)} module pages to {out_dir}")


if __name__ == "__main__":
    main()
