"""Independent PyTorch implementation of the NeuS / Color-NeuS equations,
used as the parity oracle for the JAX renderer.

Written from the published NeuS equations and the survey's behavioral
notes (SURVEY.md §3), NOT imported from the reference repo. Weights are
injected from the JAX side (dense, weight-norm already resolved), rays
are injected (perturb=0), so outputs and input-gradients must match the
JAX renderer to float tolerance.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def pe(x: torch.Tensor, L: int) -> torch.Tensor:
    if L <= 0:
        return x
    outs = [x]
    for i in range(L):
        f = 2.0 ** i
        outs.append(torch.sin(f * x))
        outs.append(torch.cos(f * x))
    return torch.cat(outs, dim=-1)


def softplus100(x):
    return F.softplus(x, beta=100)


class TorchSDF:
    """Dense-weight SDF MLP with skip and the x*scale / sdf/scale trick."""

    def __init__(self, weights, biases, skip_in, multires, scale):
        self.w = [torch.tensor(np.asarray(w), dtype=torch.float64) for w in weights]
        self.b = [torch.tensor(np.asarray(b), dtype=torch.float64) for b in biases]
        self.skip_in = skip_in
        self.multires = multires
        self.scale = scale

    def forward(self, x):
        inp = pe(x * self.scale, self.multires)
        h = inp
        n = len(self.w)
        for l in range(n):
            if l in self.skip_in:
                h = torch.cat([h, inp], dim=-1) / math.sqrt(2.0)
            h = h @ self.w[l].T + self.b[l]
            if l < n - 1:
                h = softplus100(h)
        return torch.cat([h[:, :1] / self.scale, h[:, 1:]], dim=-1)

    def sdf(self, x):
        return self.forward(x)[:, :1]

    def gradient(self, x):
        """Input-gradient with graph kept; x may be a non-leaf (e.g. a
        function of rays_o) so upstream gradients flow through both the
        SDF value and its spatial gradient."""
        if not x.requires_grad:
            x = x.detach().requires_grad_(True)
        y = self.sdf(x)
        g = torch.autograd.grad(y.sum(), x, create_graph=True)[0]
        return g, x


class TorchColor:
    def __init__(self, weights, biases, mode, multires_view):
        self.w = [torch.tensor(np.asarray(w), dtype=torch.float64) for w in weights]
        self.b = [torch.tensor(np.asarray(b), dtype=torch.float64) for b in biases]
        self.mode = mode
        self.multires_view = multires_view

    def forward(self, pts, normals, dirs, feat):
        if self.multires_view > 0:
            dirs = pe(dirs, self.multires_view)
        if self.mode == "idr":
            h = torch.cat([pts, dirs, normals, feat], dim=-1)
        elif self.mode == "no_view_dir":
            h = torch.cat([pts, normals, feat], dim=-1)
        else:
            h = torch.cat([pts, dirs, feat], dim=-1)
        n = len(self.w)
        for l in range(n):
            h = h @ self.w[l].T + self.b[l]
            if l < n - 1:
                h = torch.relu(h)
        return torch.sigmoid(h)


class TorchRelight:
    def __init__(self, in_w, in_b, mlp_ws, mlp_bs, y_in_layer, multires_view,
                 include_grad):
        self.in_w = torch.tensor(np.asarray(in_w), dtype=torch.float64)
        self.in_b = torch.tensor(np.asarray(in_b), dtype=torch.float64)
        self.ws = [torch.tensor(np.asarray(w), dtype=torch.float64) for w in mlp_ws]
        self.bs = [torch.tensor(np.asarray(b), dtype=torch.float64) for b in mlp_bs]
        self.y_in_layer = y_in_layer
        self.multires_view = multires_view
        self.include_grad = include_grad

    def forward(self, rgb, pts, dirs, grads):
        if self.multires_view > 0:
            dirs = pe(dirs, self.multires_view)
        feats = [pts, dirs] + ([grads] if self.include_grad else [])
        h = torch.cat(feats, dim=-1) @ self.in_w.T + self.in_b
        for i in range(len(self.ws)):
            h = torch.relu(h)
            if i == self.y_in_layer - 1:
                h = torch.cat([rgb, h], dim=-1) @ self.ws[i].T + self.bs[i]
            else:
                h = h @ self.ws[i].T + self.bs[i]
        drgb = h
        # inverse-sigmoid residual
        r = rgb.clamp(0, 1)
        logit = torch.log(r.clamp(min=1e-5) / (1 - r).clamp(min=1e-5))
        return torch.sigmoid(logit + drgb), drgb


def sample_pdf_det(bins, weights, n_samples):
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / n_samples, 1 - 0.5 / n_samples, n_samples,
                       dtype=bins.dtype).expand(bins.shape[0], n_samples).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = (inds - 1).clamp(min=0)
    above = inds.clamp(max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, 1, below)
    cdf_a = torch.gather(cdf, 1, above)
    bins_b = torch.gather(bins, 1, below)
    bins_a = torch.gather(bins, 1, above)
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def exclusive_weights(alpha):
    T = torch.cumprod(torch.cat([torch.ones_like(alpha[:, :1]),
                                 1.0 - alpha + 1e-7], dim=-1), dim=-1)[:, :-1]
    return alpha * T


def up_sample(rays_o, rays_d, z_vals, sdf, n_importance, inv_s):
    R, S = z_vals.shape
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    radius = pts.norm(dim=-1)
    inside = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    prev_cos = torch.cat([torch.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], dim=-1)
    cos_val = torch.minimum(prev_cos, cos_val).clamp(-1e3, 0.0) * inside
    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = torch.sigmoid(prev_esti * inv_s)
    next_cdf = torch.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    weights = exclusive_weights(alpha)
    return sample_pdf_det(z_vals, weights, n_importance)


def render_torch(sdf_net: TorchSDF, color_net: TorchColor, inv_s_value: float,
                 rays_o, rays_d, near, far, n_samples, n_importance,
                 up_sample_steps, relight: TorchRelight | None = None):
    """Full NeuS forward with perturb=0 and cos_anneal=0. float64 torch."""
    R = rays_o.shape[0]
    sample_dist = 2.0 / n_samples
    t = torch.linspace(0, 1, n_samples, dtype=torch.float64)
    z_vals = near[:, None] + (far - near)[:, None] * t[None, :]

    with torch.no_grad():
        pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
        sdf = sdf_net.sdf(pts.reshape(-1, 3)).reshape(R, n_samples)
        n_per = n_importance // up_sample_steps
        for i in range(up_sample_steps):
            new_z = up_sample(rays_o, rays_d, z_vals, sdf, n_per, 64 * 2 ** i)
            z_vals_cat = torch.cat([z_vals, new_z], dim=-1)
            z_vals, order = torch.sort(z_vals_cat, dim=-1)
            if i + 1 < up_sample_steps:
                new_pts = rays_o[:, None] + rays_d[:, None] * new_z[..., None]
                new_sdf = sdf_net.sdf(new_pts.reshape(-1, 3)).reshape(R, n_per)
                sdf = torch.gather(torch.cat([sdf, new_sdf], dim=-1), 1, order)

    z_vals = z_vals.detach()
    S = z_vals.shape[1]
    dists = torch.cat([z_vals[:, 1:] - z_vals[:, :-1],
                       torch.full((R, 1), sample_dist, dtype=torch.float64)], dim=-1)
    mid_z = z_vals + dists * 0.5
    pts = (rays_o[:, None] + rays_d[:, None] * mid_z[..., None]).reshape(-1, 3)
    dirs = (rays_d[:, None] * torch.ones(R, S, 3, dtype=torch.float64)).reshape(-1, 3)

    grads, pts_leaf = sdf_net.gradient(pts)
    out = sdf_net.forward(pts_leaf)
    sdf = out[:, :1]
    feat = out[:, 1:]
    color_pt = color_net.forward(pts_leaf, grads, dirs, feat)
    delta = None
    if relight is not None:
        color_pt, delta = relight.forward(color_pt, pts_leaf, dirs, grads)

    true_cos = (dirs * grads).sum(-1, keepdim=True)
    iter_cos = -F.relu(-true_cos * 0.5 + 0.5)
    est_next = sdf + iter_cos * dists.reshape(-1, 1) * 0.5
    est_prev = sdf - iter_cos * dists.reshape(-1, 1) * 0.5
    prev_cdf = torch.sigmoid(est_prev * inv_s_value)
    next_cdf = torch.sigmoid(est_next * inv_s_value)
    alpha = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).reshape(R, S).clamp(0, 1)
    weights = exclusive_weights(alpha)
    color = (color_pt.reshape(R, S, 3) * weights[..., None]).sum(dim=1)

    pts_norm = pts.norm(dim=-1).reshape(R, S)
    relax = (pts_norm < 1.2).double().detach()
    grad_err = ((grads.reshape(R, S, 3).norm(dim=-1) - 1.0) ** 2 * relax).sum() / \
        (relax.sum() + 1e-5)

    out = {"color_fine": color, "weights": weights,
           "weight_sum": weights.sum(-1, keepdim=True),
           "gradient_error": grad_err, "z_vals": z_vals,
           "depth": (weights * z_vals).sum(-1)}
    if delta is not None:
        out["delta_relight"] = delta.reshape(R, S, 3)
    return out
