"""Import helpers for using the UPSTREAM reference's own torch modules
(read-only at /root/reference) as numerical oracles in parity tests.

We never copy reference code — we import and *run* it on CPU torch, convert
its randomly-initialized weights through our torch->JAX converter, and check
our TPU-native modules produce the same outputs.
"""

import sys

REF = "/root/reference"


def ref_import(modname):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference targets torch 1.6; shim the APIs it uses that modern
    # torch renamed so the oracle can construct
    import torch.nn.init as tinit
    if not hasattr(tinit, "zero_"):
        tinit.zero_ = tinit.zeros_
    import importlib
    mod = importlib.import_module(modname)
    # torch>=2 propagates non-contiguous layouts where 1.6 didn't; the
    # reference's Flatten uses .view which then fails. reshape is
    # numerically identical — shim it for the oracle run only.
    if hasattr(mod, "Flatten"):
        mod.Flatten.forward = lambda self, x: x.reshape(x.size(0), -1)
    return mod
