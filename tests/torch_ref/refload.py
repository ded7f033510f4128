"""Import the PyTorch reference (/root/reference) for golden parity tests.

The reference is read-only upstream content used purely as a numerical
oracle: we instantiate its models with random weights, capture activations,
convert the state_dict with otvm_tpu.convert, and assert our JAX forward
matches.  Nothing from the reference is vendored into the framework.

Import quirks handled:
  * helpers.py reads `stty size` at import time -> patch os.popen
  * torchvision is not installed -> tests.torch_ref.tvstub
  * modules do `from helpers import *` -> /root/reference goes on sys.path
"""
from __future__ import annotations

import os
import sys

REFERENCE = "/root/reference"
_loaded = {}


def load_reference():
    if _loaded:
        return _loaded

    from . import tvstub
    tvstub.install()

    # the reference hardcodes .to(torch.cuda.current_device()) in several
    # forward paths (e.g. models/trimap/model.py:134); run them on CPU
    import torch
    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"

    real_popen = os.popen

    def fake_popen(cmd, *a, **k):
        if "stty" in cmd:
            import io
            return io.StringIO("24 80\n")
        return real_popen(cmd, *a, **k)

    os.popen = fake_popen
    sys.path.insert(0, REFERENCE)
    try:
        import helpers  # noqa: F401  (triggers the stty read)
        import models.trimap.STM as ref_stm
        import models.trimap.model as ref_trimap_model
        import models.alpha.FBA.models as ref_fba
        import models.alpha.model as ref_alpha_model
        import utils.loss_func as ref_loss
        import utils.utils as ref_utils
        import utils.optimizer as ref_optim
    finally:
        os.popen = real_popen

    _loaded.update(dict(
        stm=ref_stm, trimap_model=ref_trimap_model, fba=ref_fba,
        alpha_model=ref_alpha_model, loss=ref_loss, utils=ref_utils,
        optim=ref_optim,
    ))
    return _loaded


def seeded_torch_model(builder, seed: int = 0, tame: bool = False):
    """Instantiate a torch model with deterministic random init, eval mode.

    BN running stats are randomized too (so FrozenBatchNorm conversion is
    actually exercised, not tested against mean=0/var=1).

    tame=True uses smaller weights and unit BN stats: deep random nets with
    std-0.05 weights amplify fp32 noise chaotically (trimap logits reach
    O(100) and saturate), which makes raw-logit comparisons meaningless for
    multi-network cross-feeding tests — tame keeps activations O(1)."""
    import torch

    torch.manual_seed(seed)
    model = builder()
    with torch.no_grad():
        std = 0.02 if tame else 0.05
        for name, p in model.named_parameters():
            p.copy_(torch.randn_like(p) * std)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.zero_() if tame else b.copy_(torch.randn_like(b) * 0.1)
            elif name.endswith("running_var"):
                b.fill_(1.0) if tame else b.copy_(torch.rand_like(b) * 0.5 + 0.75)
    model.eval()
    return model
