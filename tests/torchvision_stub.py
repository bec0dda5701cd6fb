"""Minimal torchvision stand-in so the reference code (a pure test oracle)
can be imported in this torchvision-less environment.

Provides exactly what /root/reference touches: `models.resnet50/101` (the
standard public ResNet v1.5 architecture, reimplemented here in plain
torch), `models._utils.IntermediateLayerGetter`, `ops.boxes.box_area`,
`ops.misc.interpolate`, and `__version__`.
"""

import sys
import types

import torch
import torch.nn.functional as F
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        nl = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nl(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nl(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nl(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class ResNet(nn.Module):
    def __init__(self, layers, norm_layer=None,
                 replace_stride_with_dilation=None):
        super().__init__()
        nl = norm_layer or nn.BatchNorm2d
        self._norm_layer = nl
        self.inplanes = 64
        self.dilation = 1
        rswd = replace_stride_with_dilation or [False, False, False]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nl(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2, rswd[0])
        self.layer3 = self._make_layer(256, layers[2], 2, rswd[1])
        self.layer4 = self._make_layer(512, layers[3], 2, rswd[2])
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        nl = self._norm_layer
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nl(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation, nl)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes,
                                     dilation=self.dilation, norm_layer=nl))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def resnet50(replace_stride_with_dilation=None, pretrained=False,
             norm_layer=None):
    return ResNet([3, 4, 6, 3], norm_layer, replace_stride_with_dilation)


def resnet101(replace_stride_with_dilation=None, pretrained=False,
              norm_layer=None):
    return ResNet([3, 4, 23, 3], norm_layer, replace_stride_with_dilation)


class IntermediateLayerGetter(nn.ModuleDict):
    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = {}
        for name, module in model.named_children():
            layers[name] = module
            if name in orig:
                del orig[name]
            if not orig:
                break
        super().__init__(layers)
        self.return_layers = dict(return_layers)

    def forward(self, x):
        out = {}
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def box_area(boxes):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def _to_tensor(pic):
    """torchvision F.to_tensor for PIL images / HWC uint8 arrays."""
    import numpy as np

    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
    return t.float().div(255) if t.dtype == torch.uint8 else t


def _normalize(tensor, mean, std, inplace=False):
    mean = torch.as_tensor(mean, dtype=tensor.dtype)[:, None, None]
    std = torch.as_tensor(std, dtype=tensor.dtype)[:, None, None]
    return (tensor - mean) / std


def _pil_resize(img, size, *a, **kw):
    """torchvision F.resize PIL backend: size (h, w) -> PIL bilinear
    (PIL's BILINEAR is inherently antialiased on downscale)."""
    import PIL.Image

    if isinstance(size, (list, tuple)):
        oh, ow = size
    else:  # scalar: short side
        w, h = img.size
        if w < h:
            ow, oh = size, int(size * h / w)
        else:
            oh, ow = size, int(size * w / h)
    return img.resize((ow, oh), PIL.Image.BILINEAR)


def _pil_hflip(img):
    import PIL.Image

    return img.transpose(PIL.Image.FLIP_LEFT_RIGHT)


def _pil_crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


class _RandomErasing:  # referenced (never constructed) by the reference
    def __init__(self, *a, **kw):
        raise NotImplementedError


def install():
    """Register the stub as 'torchvision' in sys.modules."""
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15"
    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet50 = resnet50
    models_mod.resnet101 = resnet101
    utils_mod = types.ModuleType("torchvision.models._utils")
    utils_mod.IntermediateLayerGetter = IntermediateLayerGetter
    models_mod._utils = utils_mod
    ops_mod = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    misc_mod = types.ModuleType("torchvision.ops.misc")
    misc_mod.interpolate = F.interpolate
    ops_mod.boxes = boxes_mod
    ops_mod.misc = misc_mod
    transforms_mod = types.ModuleType("torchvision.transforms")
    transforms_mod.RandomErasing = _RandomErasing
    tf_func_mod = types.ModuleType("torchvision.transforms.functional")
    tf_func_mod.to_tensor = _to_tensor
    tf_func_mod.normalize = _normalize
    tf_func_mod.resize = _pil_resize
    tf_func_mod.hflip = _pil_hflip
    tf_func_mod.crop = _pil_crop
    transforms_mod.functional = tf_func_mod
    tv.models = models_mod
    tv.ops = ops_mod
    tv.transforms = transforms_mod
    import importlib.machinery

    for name, mod in [
        ("torchvision", tv),
        ("torchvision.models", models_mod),
        ("torchvision.models._utils", utils_mod),
        ("torchvision.ops", ops_mod),
        ("torchvision.ops.boxes", boxes_mod),
        ("torchvision.ops.misc", misc_mod),
        ("torchvision.transforms", transforms_mod),
        ("torchvision.transforms.functional", tf_func_mod),
    ]:
        # importlib.util.find_spec (used by e.g. transformers) requires a
        # non-None __spec__ on registered modules
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    return tv
