"""Shared stubs for importing the reference code from /root/reference.

Every parity test must install stubs through THIS module: within one pytest
process the first stub registered in sys.modules wins (later setdefaults
keep it), so a partial stub from one test file would break another — the
Registry here supports the full surface (register/get/__contains__) that
modules/build.py and the loss/optimizer registries need.
"""
import sys
import types


class Registry:
    def __init__(self, name):
        self._m = {}
        self._name = name

    def register(self, obj=None, name=None):
        if obj is None:
            def deco(o):
                self._m[o.__name__] = o
                return o
            return deco
        self._m[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._m[name]

    def __contains__(self, name):
        return name in self._m


def install():
    """Idempotently install stub externals + reference package paths."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    if "fvcore" not in sys.modules:
        reg = types.ModuleType("fvcore.common.registry")
        reg.Registry = Registry
        sys.modules["fvcore"] = types.ModuleType("fvcore")
        sys.modules["fvcore.common"] = types.ModuleType("fvcore.common")
        sys.modules["fvcore.common.registry"] = reg

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = type(
            "OmegaConf", (),
            {"to_container": staticmethod(lambda c, **k: dict(c))})
        oc.DictConfig = dict
        sys.modules["omegaconf"] = oc

    if "MinkowskiEngine" not in sys.modules:
        me = types.ModuleType("MinkowskiEngine")
        me.__path__ = []
        me_pool = types.ModuleType("MinkowskiEngine.MinkowskiPooling")
        me_pool.MinkowskiAvgPooling = object
        me_pool.MinkowskiMaxPooling = object
        meu = types.ModuleType("MinkowskiEngine.utils")
        meu.sparse_quantize = None
        me.MinkowskiPooling = me_pool
        me.utils = meu
        me.SparseTensor = object
        sys.modules["MinkowskiEngine"] = me
        sys.modules["MinkowskiEngine.MinkowskiPooling"] = me_pool
        sys.modules["MinkowskiEngine.utils"] = meu

    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        # a None __spec__ makes importlib.util.find_spec RAISE, which breaks
        # transformers' capability probing — give the stub a real spec
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        sys.modules["torchvision"] = tv

    if "modules.third_party.pointnet2.pointnet2_modules" not in sys.modules:
        pn2 = types.ModuleType(
            "modules.third_party.pointnet2.pointnet2_modules")
        pn2.PointnetSAModule = object
        pn2.PointnetSAModuleMSG = object
        sys.modules["modules.third_party.pointnet2.pointnet2_modules"] = pn2

    import collections
    import collections.abc
    if not hasattr(collections, "Sequence"):   # py<3.10 alias some ref files use
        collections.Sequence = collections.abc.Sequence

    for pkg, path in (
            ("modules", "/root/reference/modules"),
            ("modules.layers", "/root/reference/modules/layers"),
            ("modules.vision", "/root/reference/modules/vision"),
            ("modules.language", "/root/reference/modules/language"),
            ("modules.grounding", "/root/reference/modules/grounding"),
            ("modules.heads", "/root/reference/modules/heads"),
            ("modules.third_party", "/root/reference/modules/third_party"),
            ("modules.third_party.mask3d",
             "/root/reference/modules/third_party/mask3d"),
            ("modules.third_party.pointnet2",
             "/root/reference/modules/third_party/pointnet2"),
            ("model", "/root/reference/model"),
            ("optim", "/root/reference/optim"),
            ("optim.loss", "/root/reference/optim/loss"),
            ("optim.optimizer", "/root/reference/optim/optimizer"),
            ("data", "/root/reference/data"),
            ("data.datasets", "/root/reference/data/datasets"),
            ("common", "/root/reference/common"),
            ("evaluator", "/root/reference/evaluator"),
            ("evaluator.capeval", "/root/reference/evaluator/capeval"),
            ("evaluator.capeval.bleu",
             "/root/reference/evaluator/capeval/bleu"),
            ("evaluator.capeval.rouge",
             "/root/reference/evaluator/capeval/rouge"),
            ("evaluator.capeval.cider",
             "/root/reference/evaluator/capeval/cider")):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m
