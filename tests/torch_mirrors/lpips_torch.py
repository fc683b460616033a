"""Pure-torch mirror of lpips.LPIPS(net='vgg') with the library's state-dict
layout (net.sliceN.<features-idx>.*, linK.model.1.weight), used to validate
weights/convert_lpips numerics with random weights (torchvision is not in
this image; the real lpips checkpoint has exactly these keys)."""

import torch
import torch.nn as nn

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

# (features-index -> (in_ch, out_ch)) per slice, matching torchvision VGG16
SLICES = (
    {0: (3, 64), 2: (64, 64)},
    {5: (64, 128), 7: (128, 128)},
    {10: (128, 256), 12: (256, 256), 14: (256, 256)},
    {17: (256, 512), 19: (512, 512), 21: (512, 512)},
    {24: (512, 512), 26: (512, 512), 28: (512, 512)},
)


class _Slice(nn.Module):
    def __init__(self, convs, first):
        super().__init__()
        self.first = first
        for idx, (ci, co) in convs.items():
            self.add_module(str(idx), nn.Conv2d(ci, co, 3, padding=1))
        self.idxs = sorted(convs)

    def forward(self, x):
        if not self.first:
            x = nn.functional.max_pool2d(x, 2, 2)
        for idx in self.idxs:
            x = torch.relu(getattr(self, str(idx))(x))
        return x


class _Lin(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.model = nn.Sequential(nn.Identity(),
                                   nn.Conv2d(ch, 1, 1, bias=False))


class LPIPSTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = nn.Module()
        for s, convs in enumerate(SLICES):
            self.net.add_module(f"slice{s + 1}", _Slice(convs, s == 0))
        chans = [64, 128, 256, 512, 512]
        for k, ch in enumerate(chans):
            self.add_module(f"lin{k}", _Lin(ch))

    def forward(self, x, y):
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        total = 0
        for k in range(5):
            sl = getattr(self.net, f"slice{k + 1}")
            x, y = sl(x), sl(y)
            nx = x / x.norm(dim=1, keepdim=True).clamp_min(1e-10)
            ny = y / y.norm(dim=1, keepdim=True).clamp_min(1e-10)
            d = (nx - ny) ** 2
            lin = getattr(self, f"lin{k}").model(d)
            total = total + lin.mean(dim=(2, 3))[:, 0]
        return total
