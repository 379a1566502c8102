"""Run the reference (torch) BoxeR-2D on CPU as a parity oracle.

The reference package at /root/reference is imported with its missing CPU
dependencies stubbed (the compiled CUDA `e2edet.ops` extension, torchvision,
numba, omegaconf, torch._six), and the CUDA attention Functions are replaced
by the reference's own pure-PyTorch `Plain*Function` oracles, extracted by
AST from `/root/reference/tests/box_attn_test.py:9-42` and
`/root/reference/tests/instance_attn_test.py:11-63` (they cannot be imported
directly — those files call `.cuda()` at module scope).

This is exactly the cross-check the reference's own test strategy defines
(SURVEY.md §4): identical weights on both sides, identical input, compare
pred_logits / pred_boxes.
"""

import ast
import contextlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "e2edet"))


def _install_stubs():
    import torch
    import torch.nn.functional as F

    # Synthetic parent package: e2edet/__init__.py imports every subsystem
    # (evaluate -> pycocotools, dataset -> cv2/PIL, trainer, ...); a namespace
    # parent with __path__ lets us import just the model/module subpackages.
    if "e2edet" not in sys.modules:
        pkg = types.ModuleType("e2edet")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "e2edet")]
        sys.modules["e2edet"] = pkg

    def _nope(*a, **k):
        raise RuntimeError("stubbed: not available on CPU")

    ops = types.ModuleType("e2edet.ops")
    for name in ["box_attn_forward", "box_attn_backward",
                 "instance_attn_forward", "instance_attn_backward"]:
        setattr(ops, name, _nope)
    sys.modules.setdefault("e2edet.ops", ops)

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_misc = types.ModuleType("torchvision.ops.misc")
    tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tv_misc.interpolate = F.interpolate
    tv_ops.boxes = tv_boxes
    tv_ops.misc = tv_misc
    tv_ops.roi_align = _nope
    tv.ops = tv_ops
    tv_iru = types.ModuleType("torchvision._internally_replaced_utils")
    tv_iru.load_state_dict_from_url = _nope
    tv_tf = types.ModuleType("torchvision.transforms.functional")
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_tr.functional = tv_tf
    tv.transforms = tv_tr
    for m in [tv, tv_ops, tv_boxes, tv_misc, tv_iru, tv_tr, tv_tf]:
        sys.modules.setdefault(m.__name__, m)

    nb = types.ModuleType("numba")

    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]

        def deco(f):
            return f

        return deco

    nb.jit = _jit
    nb.njit = _jit
    nb_cuda = types.ModuleType("numba.cuda")
    nb_cuda.jit = _jit
    nb.cuda = nb_cuda
    sys.modules.setdefault("numba", nb)
    sys.modules.setdefault("numba.cuda", nb_cuda)

    om = types.ModuleType("omegaconf")

    @contextlib.contextmanager
    def open_dict(cfg):
        yield cfg

    om.open_dict = open_dict
    sys.modules.setdefault("omegaconf", om)

    six = types.ModuleType("torch._six")
    six.string_classes = (str,)
    sys.modules.setdefault("torch._six", six)


def _extract_function(path: str, name: str, namespace: dict):
    """Exec a single top-level function def from a source file into
    `namespace` (the file itself is not importable on CPU)."""
    with open(path) as f:
        src = f.read()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            mod = ast.Module(body=[node], type_ignores=[])
            code = compile(ast.fix_missing_locations(mod), path, "exec")
            exec(code, namespace)
            return namespace[name]
    raise KeyError(f"{name} not found in {path}")


def _patch_plain_ops():
    """Replace the CUDA autograd Functions with the reference's pure-torch
    oracles (grid convention: CUDA takes [0,1] locs, Plain takes 2*loc-1 —
    reference `tests/box_attn_test.py:70`)."""
    import torch
    import torch.nn.functional as F
    from e2edet.utils.general import view_with_shape
    from e2edet.module.ops import box_attention_func as baf

    ns = {"torch": torch, "F": F, "view_with_shape": view_with_shape}
    plain_box = _extract_function(
        os.path.join(REFERENCE_ROOT, "tests", "box_attn_test.py"),
        "PlainBoxAttnFunction", ns)
    plain_inst = _extract_function(
        os.path.join(REFERENCE_ROOT, "tests", "instance_attn_test.py"),
        "PlainInstanceAttnFunction", ns)

    def box_apply(value, shapes, start_idx, loc, weight, step):
        b, s, h, ch = value.shape
        # module passes weights as (B, L1, H, L, k, k); the CUDA op flattens
        # the kernel grid to P (`box_attn.cu:30-70`)
        l1 = weight.shape[1]
        nl = weight.shape[3]
        weight = weight.reshape(b, l1, h, nl, -1)
        loc = loc.reshape(b, l1, h, nl, -1, 2)
        out = plain_box(value.reshape(b, s, h * ch), shapes,
                        2.0 * loc - 1.0, weight)
        return out

    def inst_apply(value, shapes, start_idx, loc, spatial_w, level_w,
                   kernel_size, step):
        b, s, h, ch = value.shape
        out, mask_out = plain_inst(value.reshape(b, s, h * ch), shapes,
                                   2.0 * loc - 1.0, spatial_w, level_w,
                                   kernel_size)
        return out, mask_out

    baf.BoxAttnFunction.apply = staticmethod(box_apply)
    baf.InstanceAttnFunction.apply = staticmethod(inst_apply)


class NS(dict):
    """Minimal OmegaConf-like config node: dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return dict.get(self, k, default)


def boxer2d_config(num_classes=91, hidden_dim=256, nhead=8, num_level=4,
                   enc_layers=6, dec_layers=6, dim_feedforward=1024,
                   num_queries=300, use_mask=False, backbone="resnet50",
                   ref_size=4, residual_mode="v1"):
    """Reference model_config.boxer2d tree (values from
    `e2edet/config/base_boxer2d_detection.yaml:92-143`)."""
    loss_params = NS(
        class_loss_coef=2, bbox_loss_coef=5, giou_loss_coef=2,
        use_mask=use_mask,
        matcher=NS(type="hungarian", params=NS(
            class_weight=2, bbox_weight=5, giou_weight=2,
            focal_label=True)),
    )
    if use_mask:
        loss_params["mask_loss_coef"] = 5
        loss_params["dice_loss_coef"] = 5
    return NS(
        hidden_dim=hidden_dim,
        aux_loss=True,
        deform_lr_multi=0.1,
        use_mask=use_mask,
        ref_size=ref_size,
        # training criterion (values: `base_boxer2d_detection.yaml:100-113`,
        # `COCO-InstanceSegmentation/boxer2d_R_101_3x.yaml:13-14`) — used by
        # the gradient-parity tests via `init_losses_and_metrics`
        loss=NS(type="boxer2d", params=loss_params),
        metric=[],
        backbone=NS(type=backbone, params=NS(
            pretrained=False, pretrained_path=None, freeze_backbone=None,
            position_encoding="fixed_box",
            return_interm_layers=["layer2", "layer3", "layer4"],
            hidden_dim=hidden_dim, ref_size=ref_size)),
        transformer=NS(type="box_transformer", params=NS(
            hidden_dim=hidden_dim, nhead=nhead, nlevel=num_level,
            enc_layers=enc_layers, dec_layers=dec_layers,
            dim_feedforward=dim_feedforward, dropout=0.0,
            num_queries=num_queries, use_mask=use_mask, ref_size=ref_size,
            residual_mode=residual_mode)),
    )


def build_reference_boxer2d(num_classes=91, **kwargs):
    """Construct the reference torch BoxeR2D on CPU with Plain ops."""
    _install_stubs()
    _patch_plain_ops()
    from e2edet.model.boxer2d import BoxeR2D

    config = boxer2d_config(num_classes=num_classes, **kwargs)
    global_config = NS(training=NS(iter_per_update=1))
    model = BoxeR2D(config, num_classes, global_config=global_config)
    model._build()
    model.init_losses_and_metrics()
    model.inference(True)
    return model
