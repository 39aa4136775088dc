"""Generate the markdown API reference under docs/api/ from docstrings.

The reference ships a Sphinx tree (reference ``docs/conf.py``,
``docs/MuyGPyS/*``); this repo keeps the documentation toolchain-free: one
introspection pass over the public modules writes plain markdown, committed
in-tree, and CI re-generates and diffs (``--check``) so the pages can never
go stale.

Usage:
    python scripts/gen_api_docs.py          # (re)write docs/api/
    python scripts/gen_api_docs.py --check  # fail if docs/api/ is stale
"""

import importlib
import inspect
import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

# the public surface, one page per module
MODULES = [
    "muygpys_tpu.config",
    "muygpys_tpu.neighbors",
    "muygpys_tpu.serve",
    "muygpys_tpu.checkpoint",
    "muygpys_tpu.gp.muygps",
    "muygpys_tpu.gp.multivariate_muygps",
    "muygpys_tpu.gp.mean",
    "muygpys_tpu.gp.variance",
    "muygpys_tpu.gp.fast_mean",
    "muygpys_tpu.gp.fast_precompute",
    "muygpys_tpu.gp.tensors",
    "muygpys_tpu.gp.kernels.kernel_fn",
    "muygpys_tpu.gp.kernels.matern",
    "muygpys_tpu.gp.kernels.rbf",
    "muygpys_tpu.gp.kernels.experimental.shear",
    "muygpys_tpu.gp.deformation.metric",
    "muygpys_tpu.gp.deformation.isotropy",
    "muygpys_tpu.gp.deformation.anisotropy",
    "muygpys_tpu.gp.deformation.null",
    "muygpys_tpu.gp.hyperparameter.scalar",
    "muygpys_tpu.gp.hyperparameter.vector",
    "muygpys_tpu.gp.hyperparameter.tensor",
    "muygpys_tpu.gp.hyperparameter.scale",
    "muygpys_tpu.gp.hyperparameter.experimental.hierarchical",
    "muygpys_tpu.gp.noise.homoscedastic",
    "muygpys_tpu.gp.noise.heteroscedastic",
    "muygpys_tpu.gp.noise.null",
    "muygpys_tpu.gp.noise.shear",
    "muygpys_tpu.optimize.batch",
    "muygpys_tpu.optimize.loss",
    "muygpys_tpu.optimize.objective",
    "muygpys_tpu.optimize.chassis",
    "muygpys_tpu.optimize.fused_chassis",
    "muygpys_tpu.optimize.device_chassis",
    "muygpys_tpu.optimize.fast_objective",
    "muygpys_tpu.optimize.shear_objective",
    "muygpys_tpu.optimize.bayes",
    "muygpys_tpu.optimize.bijectors",
    "muygpys_tpu.optimize.experimental.chassis",
    "muygpys_tpu.parallel.mesh",
    "muygpys_tpu.parallel.sharding",
    "muygpys_tpu.parallel.knn",
    "muygpys_tpu.pallas.fused_predict",
    "muygpys_tpu.pallas.fused_train",
    "muygpys_tpu.pallas.knn",
    "muygpys_tpu.pallas.matern_nu",
    "muygpys_tpu.pallas.multiout_solve",
    "muygpys_tpu.ops.tensors",
    "muygpys_tpu.ops.kernels",
    "muygpys_tpu.ops.bessel",
    "muygpys_tpu.ops.shear",
    "muygpys_tpu.ops.solve",
    "muygpys_tpu.ops.lanes_solver",
    "muygpys_tpu.ops.loss",
    "muygpys_tpu.ops.scale",
    "muygpys_tpu.ops.noise",
    "muygpys_tpu.nn.muygps_layer",
    "muygpys_tpu.examples.regress",
    "muygpys_tpu.examples.classify",
    "muygpys_tpu.examples.two_class_classify_uq",
    "muygpys_tpu.examples.fast_posterior_mean",
    "muygpys_tpu.examples.from_indices",
    "muygpys_tpu.examples.deep_kernel",
    "muygpys_tpu.performance.benchmark",
    "muygpys_tpu.performance.headline",
    "muygpys_tpu.performance.scaling",
]


def _sig(obj) -> str:
    import re

    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs of function/object defaults carry memory
    # addresses — scrub them so regeneration is deterministic
    return re.sub(r" at 0x[0-9a-fA-F]+", "", sig)


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(undocumented)*"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), ""]

    classes = []
    functions = []
    data = []
    for name in sorted(vars(mod)):
        if not _is_public(name):
            continue
        obj = vars(mod)[name]
        if inspect.isclass(obj) and obj.__module__ == modname:
            classes.append((name, obj))
        elif (
            inspect.isfunction(obj) or inspect.isbuiltin(obj)
        ) and getattr(obj, "__module__", None) == modname:
            functions.append((name, obj))
        elif (
            not inspect.ismodule(obj)
            and not inspect.isclass(obj)
            and not callable(obj)
            and name.isupper()
        ):
            data.append((name, obj))

    # module-level callables that are instances (OptimizeFn, LossFn,
    # MetricFn singletons like l2/F2) — a central idiom of this library
    instances = [
        (name, obj)
        for name in sorted(vars(mod))
        if _is_public(name)
        and not inspect.isclass(obj := vars(mod)[name])
        and not inspect.isfunction(obj)
        and not inspect.ismodule(obj)
        and callable(obj)
        and type(obj).__module__.startswith("muygpys_tpu")
    ]

    for name, obj in classes:
        lines += [f"## class `{name}{_sig(obj)}`", "", _doc(obj), ""]
        for mname, meth in sorted(vars(obj).items()):
            if not _is_public(mname) or not callable(meth):
                continue
            if isinstance(meth, (staticmethod, classmethod)):
                meth = meth.__func__
            if not (inspect.isfunction(meth)):
                continue
            lines += [
                f"### `{name}.{mname}{_sig(meth)}`",
                "",
                _doc(meth),
                "",
            ]
    for name, obj in functions:
        lines += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
    for name, obj in instances:
        lines += [
            f"## `{name}` — instance of `{type(obj).__name__}`",
            "",
            _doc(obj),
            "",
        ]
    if data:
        lines += ["## Constants", ""]
        for name, obj in data:
            lines += [f"- `{name} = {obj!r}`"]
        lines += [""]
    return "\n".join(lines) + "\n"


def generate(out_dir: str) -> dict:
    pages = {}
    for modname in MODULES:
        fname = modname.replace(".", "_") + ".md"
        pages[fname] = render_module(modname)
    index = [
        "# muygpys_tpu API reference",
        "",
        "Generated by `scripts/gen_api_docs.py` (CI re-generates and "
        "diffs; do not edit by hand).",
        "",
    ]
    for modname in MODULES:
        fname = modname.replace(".", "_") + ".md"
        index.append(f"- [`{modname}`]({fname})")
    pages["index.md"] = "\n".join(index) + "\n"

    os.makedirs(out_dir, exist_ok=True)
    for fname, content in pages.items():
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(content)
    return pages


def main():
    target = os.path.join(REPO_ROOT, "docs", "api")
    if "--check" in sys.argv:
        with tempfile.TemporaryDirectory() as tmp:
            pages = generate(tmp)
        stale = []
        for fname, content in pages.items():
            path = os.path.join(target, fname)
            if not os.path.exists(path):
                stale.append(f"missing: {fname}")
                continue
            with open(path) as f:
                if f.read() != content:
                    stale.append(f"stale: {fname}")
        committed = set(os.listdir(target)) if os.path.isdir(target) else set()
        for extra in committed - set(pages):
            stale.append(f"orphaned: {extra}")
        if stale:
            print("API docs out of date — run scripts/gen_api_docs.py:")
            for s in stale:
                print("  " + s)
            raise SystemExit(1)
        print(f"API docs up to date ({len(pages)} pages)")
    else:
        pages = generate(target)
        print(f"wrote {len(pages)} pages to {target}")


if __name__ == "__main__":
    main()
