"""Import helpers for using the UPSTREAM reference's own torch modules
(read-only at /root/reference) as numerical oracles in parity tests.

We never copy reference code — we import and *run* it on CPU torch, convert
its randomly-initialized weights through our torch->JAX converter, and check
our TPU-native modules produce the same outputs.
"""

import sys

REF = "/root/reference"
REF_RESTYLE = "/root/reference/restyle-encoder"


def ref_import(modname):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference targets torch 1.6; shim the APIs it uses that modern
    # torch renamed so the oracle can construct
    import torch.nn.init as tinit
    if not hasattr(tinit, "zero_"):
        tinit.zero_ = tinit.zeros_
    install_dep_stubs()
    install_stylegan2_op_stub()
    import importlib
    mod = importlib.import_module(modname)
    # torch>=2 propagates non-contiguous layouts where 1.6 didn't; the
    # reference's Flatten uses .view which then fails. reshape is
    # numerically identical — shim it for the oracle run only.
    if hasattr(mod, "Flatten"):
        mod.Flatten.forward = lambda self, x: x.reshape(x.size(0), -1)
    return mod


def ref_import_restyle(modname):
    """Import a module from the vendored restyle-encoder tree
    (top-level packages: models, configs, utils, training, criteria, ...)."""
    if REF_RESTYLE not in sys.path:
        sys.path.insert(0, REF_RESTYLE)
    return ref_import(modname)


def install_dep_stubs():
    """Stub the reference's heavyweight/unavailable deps (torchvision,
    imageio) that its modules import at top level but our oracle tests
    never exercise."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvr = types.ModuleType("torchvision.models.resnet")
        tvt = types.ModuleType("torchvision.transforms")

        def resnet34(*a, **k):
            raise RuntimeError("torchvision stub: resnet34 unavailable")
        tvr.resnet34 = resnet34
        tvm.resnet = tvr
        tvm.resnet34 = resnet34
        tv.models = tvm

        class _T:  # transform placeholders; constructed but never called
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("torchvision stub transform called")
        for name in ("Compose", "ToPILImage", "Resize", "CenterCrop",
                     "ToTensor", "Normalize", "RandomCrop",
                     "RandomHorizontalFlip"):
            setattr(tvt, name, type(name, (_T,), {}))
        tvt.functional = types.SimpleNamespace(
            hflip=lambda x: (_ for _ in ()).throw(RuntimeError("stub")))
        tv.transforms = tvt
        tvd = types.ModuleType("torchvision.datasets")
        tv.datasets = tvd
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models.resnet"] = tvr
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.datasets"] = tvd
    for name in ("skimage", "skimage.transform", "turbojpeg", "pandas"):
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
    if "bcolz" not in sys.modules:
        try:
            import bcolz  # noqa: F401
        except ImportError:
            bz = types.ModuleType("bcolz")
            bz.carray = lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("bcolz stub"))
            bz.open = bz.carray
            sys.modules["bcolz"] = bz
    if "imageio" not in sys.modules:
        try:
            import imageio  # noqa: F401
        except ImportError:
            im = types.ModuleType("imageio")
            im.imread = lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("imageio stub"))
            sys.modules["imageio"] = im


def ref_import_efficientnet():
    """Load ``/root/reference/backbone/EfficientNets.py`` as an oracle.

    The upstream file is syntactically corrupt — three lines of pasted
    non-code text (a Chinese job posting) sit mid-file, so a direct
    import raises ``SyntaxError: invalid character '、'`` (line 370).
    The Python code itself is INTACT: the paste only appended text after
    ``ops = block_string.split('_')`` and added two pure-text lines, so
    stripping every non-ASCII character restores the module exactly
    (the two text lines become blank). No reference code is rewritten —
    this is the same run-the-upstream-as-oracle pattern as
    ``cuda_noop``; it closes the one §2.2 backbone without a true
    numerics oracle."""
    name = "ref_efficientnets_sanitized"
    if name in sys.modules:
        return sys.modules[name]
    import types
    install_dep_stubs()
    path = REF + "/backbone/EfficientNets.py"
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    # a line BEGINNING with a non-ASCII char is pure pasted text (drop
    # it whole — fragments like "C/C++" inside it are not code); a line
    # merely CONTAINING non-ASCII is code with text appended (keep the
    # ASCII prefix)
    src = "\n".join(
        "" if line and ord(line[0]) > 127
        else "".join(c for c in line if ord(c) < 128)
        for line in lines)
    mod = types.ModuleType(name)
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    # same torch>=2 .view-on-noncontiguous shim as ref_import
    mod.Flatten.forward = lambda self, x: x.reshape(x.size(0), -1)
    sys.modules[name] = mod
    return mod


import contextlib


@contextlib.contextmanager
def cuda_noop():
    """Run a reference module that hardcodes ``.cuda()`` (e.g. NPCFace,
    head/metrics.py:622) on CPU torch by making the device moves no-ops.
    Scoped: restores the real methods on exit so other oracle tests keep
    honest device semantics."""
    import torch
    saved = (torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = saved


def install_stylegan2_op_stub():
    """The reference's ``backbone.stylegan2.op`` JIT-compiles CUDA at import
    (op/upfirdn2d.py:8-14) and cannot load on CPU. Register a pure-torch
    stand-in implementing the documented ``upfirdn2d_native`` semantics
    (op/upfirdn2d.py:150-184) and ``fused_leaky_relu`` (op/fused_act.py),
    so the rosinality model can run as a CPU oracle."""
    import types
    import torch
    import torch.nn.functional as F

    if "backbone.stylegan2.op" in sys.modules:
        return

    def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
        n, c, h, w = x.shape
        p0, p1 = pad
        z = x.new_zeros(n, c, h * up, w * up)
        z[:, :, ::up, ::up] = x
        z = F.pad(z, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
        z = z[:, :, max(-p0, 0): z.shape[2] - max(-p1, 0),
              max(-p0, 0): z.shape[3] - max(-p1, 0)]
        wk = torch.flip(kernel, [0, 1])[None, None].repeat(c, 1, 1, 1)
        z = F.conv2d(z, wk, groups=c)
        return z[:, :, ::down, ::down]

    def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            rest = [1] * (x.ndim - 2)
            x = x + bias.reshape(1, bias.shape[0], *rest)
        return F.leaky_relu(x, negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope,
                                    self.scale)

    stub = types.ModuleType("backbone.stylegan2.op")
    stub.upfirdn2d = upfirdn2d
    stub.fused_leaky_relu = fused_leaky_relu
    stub.FusedLeakyReLU = FusedLeakyReLU
    sys.modules["backbone.stylegan2.op"] = stub
    # mirror for the restyle-encoder vendored copy
    sys.modules["models.stylegan2.op"] = stub
