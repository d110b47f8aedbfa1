"""Set up a runnable CPU copy of the reference dflex engine at /tmp/dflex_ref.

The reference (NVlabs/DiffRL) targets old Python; on this image (py3.12)
two compat patches are needed before `import dflex` works:

1. the removed stdlib ``imp`` module (adjoint.py:9, used by import_module
   at adjoint.py:1684-1688) -> shimmed via importlib;
2. ``ast.Index`` was removed in py3.9: ``node.slice`` IS the expression
   now (adjoint.py:1108-1115 reads ``node.slice.value``).

Run, then generate parity fixtures:

    python tools/setup_dflex_ref.py
    python tools/gen_parity_fixtures.py --dflex /tmp/dflex_ref

First `import dflex` triggers a ~3-5 min g++ build of the CPU kernels.
/tmp is wiped between sessions; re-run this script as needed.
"""

import os
import shutil
import sys

SRC = "/root/reference/dflex"
DST = "/tmp/dflex_ref"

IMP_SHIM = '''"""Minimal shim for the removed stdlib `imp` module (py>=3.12)."""
import importlib.util as _u


class _File:
    def __init__(self, path):
        self.path = path

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def find_module(name, paths):
    for p in paths:
        for suffix in (".so", ".py"):
            cand = p + "/" + name + suffix
            import os as _os
            if _os.path.exists(cand):
                return _File(cand), cand, (suffix, "rb", 3 if suffix == ".so" else 1)
    raise ImportError(name)


def load_module(name, file, path, description):
    if path.endswith(".so"):
        spec = _u.spec_from_file_location(name, path)
    else:
        spec = _u.spec_from_file_location(name, path)
    mod = _u.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import sys as _sys
    _sys.modules[name] = mod
    return mod


def load_dynamic(name, path):
    return load_module(name, None, path, None)
'''


def main():
    if os.path.exists(os.path.join(DST, "dflex", "adjoint.py")):
        print(f"{DST} already present; leaving as is")
        return

    shutil.copytree(SRC, DST, dirs_exist_ok=True)

    # imp shim importable from inside the copied package
    with open(os.path.join(DST, "imp.py"), "w") as f:
        f.write(IMP_SHIM)

    adjoint = os.path.join(DST, "dflex", "adjoint.py")
    with open(adjoint) as f:
        src = f.read()

    # py>=3.9: ast.Subscript.slice is the expression itself (no ast.Index)
    src = src.replace(
        "if isinstance(node.slice.value, ast.Tuple):",
        "if isinstance(node.slice, ast.Tuple):",
    )
    src = src.replace(
        "for arg in node.slice.value.elts:",
        "for arg in node.slice.elts:",
    )
    src = src.replace(
        "var = adj.eval(node.slice.value)",
        "var = adj.eval(node.slice)",
    )

    with open(adjoint, "w") as f:
        f.write(src)

    print(f"reference dflex prepared at {DST}")
    print("import test: PYTHONPATH includes the copy dir so the imp shim wins")


if __name__ == "__main__":
    main()
