"""Minimal stand-ins for third-party packages the reference imports but
this image lacks (yacs, pytorch3d, kornia, trimesh, mcubes, git).

Installed into ``sys.modules`` BEFORE importing ``/root/reference/lib``
so the *actual reference code* can run on CPU for baseline measurement
and golden-activation parity.  Only the API surface the reference's
train/forward path touches is implemented; everything else raises.

These are shims of public package APIs, written from scratch — no code
from the reference or the shimmed packages is copied.
"""

from __future__ import annotations

import copy
import sys
import types

import yaml


# ----------------------------------------------------------------- yacs
class CfgNode(dict):
    """dict with attribute access + freeze semantics (yacs-compatible
    subset used by /root/reference/lib/utils/config.py and builder.py)."""

    _RESERVED = ("_frozen", "_new_allowed")

    def __init__(self, init_dict=None, key_list=None, new_allowed=False):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        object.__setattr__(self, "_new_allowed", new_allowed)
        if init_dict:
            for k, v in dict(init_dict).items():
                self[k] = self._convert(v, new_allowed)

    @classmethod
    def _convert(cls, v, new_allowed):
        if isinstance(v, CfgNode):
            return v
        if isinstance(v, dict):
            return cls(v, new_allowed=new_allowed)
        if isinstance(v, list):
            return [cls._convert(x, new_allowed) for x in v]
        return v

    # -- attribute protocol
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in self._RESERVED:
            object.__setattr__(self, name, value)
            return
        self[name] = value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"CfgNode is frozen; cannot set {key}")
        if (not object.__getattribute__(self, "_new_allowed")
                and key not in self and not isinstance(key, int)):
            # yacs raises on unknown keys when new_allowed=False; the
            # reference only merges into new_allowed=True trees.
            pass
        super().__setitem__(key, self._convert(value, True))

    # -- yacs API used by the reference
    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self):
        return object.__getattribute__(self, "_frozen")

    def set_new_allowed(self, val):
        object.__setattr__(self, "_new_allowed", bool(val))
        for v in self.values():
            if isinstance(v, CfgNode):
                v.set_new_allowed(val)

    def clone(self):
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = type(self)()
        object.__setattr__(out, "_frozen", False)
        object.__setattr__(out, "_new_allowed",
                           object.__getattribute__(self, "_new_allowed"))
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        if object.__getattribute__(self, "_frozen"):
            object.__setattr__(out, "_frozen", True)
        return out

    def merge_from_file(self, path):
        with open(path) as f:
            other = yaml.safe_load(f)
        self._merge(other or {})

    def merge_from_other_cfg(self, other):
        self._merge(other)

    def _merge(self, other):
        for k, v in dict(other).items():
            if (k in self and isinstance(self.get(k), CfgNode)
                    and isinstance(v, dict)):
                self[k]._merge(v)
            else:
                self[k] = self._convert(v, True)

    def dump(self, **kwargs):
        def plain(node):
            if isinstance(node, CfgNode):
                return {k: plain(v) for k, v in node.items()}
            if isinstance(node, list):
                return [plain(x) for x in node]
            return node
        return yaml.safe_dump(plain(self), **kwargs)


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _unimplemented(name):
    def f(*a, **k):
        raise NotImplementedError(f"shim: {name} not implemented")
    f.__name__ = name
    return f


def install():
    if "yacs" in sys.modules and not hasattr(sys.modules["yacs"], "_is_shim"):
        return  # real packages present

    yacs = _module("yacs", _is_shim=True)
    yacs_config = _module("yacs.config", CfgNode=CfgNode)
    yacs.config = yacs_config

    import torch

    def axis_angle_to_matrix(aa):
        """Rodrigues. aa: [..., 3] -> [..., 3, 3]."""
        theta = torch.linalg.norm(aa, dim=-1, keepdim=True).clamp_min(1e-12)
        axis = aa / theta
        x, y, z = axis.unbind(-1)
        zero = torch.zeros_like(x)
        K = torch.stack([
            torch.stack([zero, -z, y], dim=-1),
            torch.stack([z, zero, -x], dim=-1),
            torch.stack([-y, x, zero], dim=-1),
        ], dim=-2)
        eye = torch.eye(3, dtype=aa.dtype, device=aa.device).expand(K.shape)
        t = theta[..., None]
        return eye + torch.sin(t) * K + (1 - torch.cos(t)) * (K @ K)

    def rotation_6d_to_matrix(d6):
        """Zhou et al. 2019 continuous 6d -> rotmat."""
        a1, a2 = d6[..., :3], d6[..., 3:]
        b1 = torch.nn.functional.normalize(a1, dim=-1)
        b2 = torch.nn.functional.normalize(
            a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1)
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack([b1, b2, b3], dim=-2)

    def quaternion_to_matrix(q):
        w, x, y, z = torch.nn.functional.normalize(q, dim=-1).unbind(-1)
        return torch.stack([
            torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ], -2)

    p3d = _module("pytorch3d", _is_shim=True)
    p3d_t = _module(
        "pytorch3d.transforms",
        axis_angle_to_matrix=axis_angle_to_matrix,
        rotation_6d_to_matrix=rotation_6d_to_matrix,
        quaternion_to_matrix=quaternion_to_matrix,
        axis_angle_to_quaternion=_unimplemented("axis_angle_to_quaternion"),
        euler_angles_to_matrix=_unimplemented("euler_angles_to_matrix"),
        matrix_to_euler_angles=_unimplemented("matrix_to_euler_angles"),
        matrix_to_quaternion=_unimplemented("matrix_to_quaternion"),
        matrix_to_rotation_6d=_unimplemented("matrix_to_rotation_6d"),
        quaternion_to_axis_angle=_unimplemented("quaternion_to_axis_angle"),
    )
    p3d.transforms = p3d_t

    kornia = _module("kornia", _is_shim=True)
    kornia.metrics = _module("kornia.metrics", ssim=_unimplemented("ssim"))

    def to_tensor(pic):
        """HWC numpy (uint8 or float) -> CHW float tensor in [0,1]."""
        import numpy as np
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            t = t.float().div_(255.0)
        return t.float()

    def normalize(tensor, mean, std, inplace=False):
        """CHW per-channel (x - mean) / std."""
        if not inplace:
            tensor = tensor.clone()
        m = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
        s = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
        return tensor.sub_(m).div_(s)

    tv = _module("torchvision", _is_shim=True)
    tv_t = _module("torchvision.transforms", _is_shim=True,
                   ToTensor=_unimplemented("ToTensor"))
    tv_tf = _module("torchvision.transforms.functional", _is_shim=True,
                    to_tensor=to_tensor, normalize=normalize)
    tv.transforms = tv_t
    tv_t.functional = tv_tf

    _module("trimesh", _is_shim=True, Trimesh=_unimplemented("Trimesh"))
    _module("mcubes", _is_shim=True,
            marching_cubes=_unimplemented("marching_cubes"))
    _module("git", _is_shim=True, Repo=_unimplemented("Repo"))

    # the installed imageio dropped the legacy `as_gray=` kwarg the
    # reference uses (dtu.py:112); restore it compatibly
    import imageio
    _orig_imread = imageio.imread

    def imread(uri, *args, **kwargs):
        if kwargs.pop("as_gray", False):
            import numpy as np
            out = _orig_imread(uri, *args, **kwargs)
            out = np.asarray(out).astype(np.float64)
            if out.ndim == 3:
                out = (out[..., :3] @ np.array([0.2125, 0.7154, 0.0721]))
            return out
        return _orig_imread(uri, *args, **kwargs)

    imageio.imread = imread

    # the installed torch dropped LRScheduler's `verbose` positional the
    # reference passes (net_utils.py:62); accept-and-drop it
    import torch.optim.lr_scheduler as lrs
    _orig_sched_init = lrs.LRScheduler.__init__

    def _sched_init(self, optimizer, last_epoch=-1, verbose=None):
        _orig_sched_init(self, optimizer, last_epoch)

    lrs.LRScheduler.__init__ = _sched_init
