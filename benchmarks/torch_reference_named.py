"""Reference-named torch models: state_dict-key-exact twins for import tests.

`benchmarks/torch_reference.py` builds architecture-identical torch nets for
THROUGHPUT baselines; their `nn.Sequential` key layout differs from the
reference's. These twins reproduce the reference's exact module NAMES so
their ``state_dict()`` keys match what a real reference checkpoint contains:

  * ``RNASeqSurvivalModel`` — keys ``mlp.{0,1,4,5,8,9,12}.*``
    (reference train_rnaseq_only.py:126-151).
  * ``PartialModalityNet`` — keys ``ct_encoder.features.denseblock{b}.
    denselayer{l}.layers.{norm1,conv1,norm2,conv2}.*`` etc. (the MONAI
    ``DenseNet121(spatial_dims=3)`` layout used at reference
    partial_modality_training.py:171-176) plus ``rna_encoder.{0,1,4}.*``,
    ``clinical_encoder.0.*``, ``gate.{0,2}.*``, ``fusion.{0,1,4}.*``,
    ``cox_head.*`` (reference :196-232). ``use_monai=False`` swaps the CT
    encoder for the reference's Sequential fallback (:179-191).

Benchmark/test harness only — the framework itself contains no torch.
"""

from __future__ import annotations

from collections import OrderedDict


def _monai_densenet121_3d(out_channels=128):
    """MONAI DenseNet121(spatial_dims=3, in_channels=1) with MONAI's exact
    module names (monai.networks.nets.densenet key layout)."""
    import torch
    import torch.nn as nn

    class DenseLayer(nn.Module):
        def __init__(self, in_ch, growth, bn_size):
            super().__init__()
            self.layers = nn.Sequential(OrderedDict([
                ("norm1", nn.BatchNorm3d(in_ch)),
                ("relu1", nn.ReLU(inplace=True)),
                ("conv1", nn.Conv3d(in_ch, bn_size * growth, 1, bias=False)),
                ("norm2", nn.BatchNorm3d(bn_size * growth)),
                ("relu2", nn.ReLU(inplace=True)),
                ("conv2", nn.Conv3d(bn_size * growth, growth, 3, padding=1,
                                    bias=False)),
            ]))

        def forward(self, x):
            return torch.cat([x, self.layers(x)], 1)

    class DenseBlock(nn.Sequential):
        def __init__(self, in_ch, n_layers, growth, bn_size):
            super().__init__()
            for i in range(n_layers):
                self.add_module(f"denselayer{i + 1}",
                                DenseLayer(in_ch + i * growth, growth,
                                           bn_size))

    class Transition(nn.Sequential):
        def __init__(self, in_ch, out_ch):
            super().__init__(OrderedDict([
                ("norm", nn.BatchNorm3d(in_ch)),
                ("relu", nn.ReLU(inplace=True)),
                ("conv", nn.Conv3d(in_ch, out_ch, 1, bias=False)),
                ("pool", nn.AvgPool3d(2)),
            ]))

    class DenseNet121(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(OrderedDict([
                ("conv0", nn.Conv3d(1, 64, 7, stride=2, padding=3,
                                    bias=False)),
                ("norm0", nn.BatchNorm3d(64)),
                ("relu0", nn.ReLU(inplace=True)),
                ("pool0", nn.MaxPool3d(3, stride=2, padding=1)),
            ]))
            ch = 64
            for bi, n in enumerate((6, 12, 24, 16)):
                self.features.add_module(f"denseblock{bi + 1}",
                                         DenseBlock(ch, n, 32, 4))
                ch += n * 32
                if bi != 3:
                    self.features.add_module(f"transition{bi + 1}",
                                             Transition(ch, ch // 2))
                    ch //= 2
            self.features.add_module("norm5", nn.BatchNorm3d(ch))
            self.class_layers = nn.Sequential(OrderedDict([
                ("relu", nn.ReLU(inplace=True)),
                ("pool", nn.AdaptiveAvgPool3d(1)),
                ("flatten", nn.Flatten(1)),
                ("out", nn.Linear(ch, out_channels)),
            ]))

        def forward(self, x):
            return self.class_layers(self.features(x))

    net = DenseNet121()
    _apply_monai_densenet_init(net)
    return net


def _apply_monai_densenet_init(net):
    """MONAI's DenseNet constructor init (monai/networks/nets/densenet.py:
    kaiming_normal_ on convs, BN weight=1/bias=0, Linear bias=0). The real
    reference runs MONAI, whose __init__ ALWAYS applies this — a hand-built
    layout twin without it silently trains from torch's default
    kaiming_uniform(a=sqrt(5)) convs (std sqrt(6)x smaller), which round 4
    measured as a ~0.2 C-index dynamics offset on a 31-row cohort
    (PARITY_TWIN.md simple_fusion attribution)."""
    import torch.nn as nn

    for m in net.modules():
        if isinstance(m, nn.Conv3d):
            nn.init.kaiming_normal_(m.weight)
        elif isinstance(m, nn.BatchNorm3d):
            nn.init.constant_(m.weight, 1)
            nn.init.constant_(m.bias, 0)
        elif isinstance(m, nn.Linear):
            nn.init.constant_(m.bias, 0)


def build_reference_named_partial_modality(rna_dim=5005, clinical_dim=1,
                                           use_monai=True):
    """The reference's PartialModalityNet with its exact attribute names
    (partial_modality_training.py:165-277): encoders on raw inputs, feature
    masking, gate over [features ‖ mask], gate-weighted fusion, Cox head."""
    import torch
    import torch.nn as nn

    class PartialModalityNet(nn.Module):
        def __init__(self):
            super().__init__()
            if use_monai:
                self.ct_encoder = _monai_densenet121_3d(128)
            else:
                # the reference's MONAI-less fallback (:179-191)
                self.ct_encoder = nn.Sequential(
                    nn.Conv3d(1, 32, 3, stride=2, padding=1),
                    nn.BatchNorm3d(32), nn.ReLU(),
                    nn.Conv3d(32, 64, 3, stride=2, padding=1),
                    nn.BatchNorm3d(64), nn.ReLU(),
                    nn.Conv3d(64, 128, 3, stride=2, padding=1),
                    nn.BatchNorm3d(128), nn.ReLU(),
                    nn.AdaptiveAvgPool3d(1),
                )
            self.rna_encoder = nn.Sequential(
                nn.Linear(rna_dim, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(512, 128), nn.ReLU())
            self.clinical_encoder = nn.Sequential(
                nn.Linear(clinical_dim, 32), nn.ReLU())
            self.gate = nn.Sequential(
                nn.Linear(128 + 128 + 32 + 3, 64), nn.ReLU(),
                nn.Linear(64, 3), nn.Softmax(dim=1))
            self.fusion = nn.Sequential(
                nn.Linear(288, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(256, 128), nn.ReLU())
            self.cox_head = nn.Linear(128, 1)

        def forward(self, ct, rna, clinical, mask):
            ct_feat = self.ct_encoder(ct)
            if ct_feat.dim() > 2:
                ct_feat = ct_feat.flatten(1)
            f = [ct_feat * mask[:, 0:1],
                 self.rna_encoder(rna) * mask[:, 1:2],
                 self.clinical_encoder(clinical) * mask[:, 2:3]]
            g = self.gate(torch.cat(f + [mask], 1))
            fused = torch.cat([f[0] * g[:, 0:1], f[1] * g[:, 1:2],
                               f[2] * g[:, 2:3]], 1)
            return self.cox_head(self.fusion(fused)).squeeze(1), g

    return PartialModalityNet()


def _fallback_cnn(out_ch=128):
    """The reference's MONAI-less CT encoder (same Sequential in
    simple_fusion.py:191-204, flexible_multimodal.py:168-181,
    final_multimodal.py:76-88, partial_modality_training.py:179-191)."""
    import torch.nn as nn

    return nn.Sequential(
        nn.Conv3d(1, 32, 3, stride=2, padding=1),
        nn.BatchNorm3d(32), nn.ReLU(),
        nn.Conv3d(32, 64, 3, stride=2, padding=1),
        nn.BatchNorm3d(64), nn.ReLU(),
        nn.Conv3d(64, out_ch, 3, stride=2, padding=1),
        nn.BatchNorm3d(out_ch), nn.ReLU(),
        nn.AdaptiveAvgPool3d(1),
    )


def _rna_deep(rna_dim, out=256):
    """Reference deep RNA encoder (simple_fusion.py:167-179)."""
    import torch.nn as nn

    return nn.Sequential(
        nn.Linear(rna_dim, 1024), nn.BatchNorm1d(1024), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(512, out), nn.ReLU())


def _fusion_3layer(in_dim):
    """Reference fusion head (simple_fusion.py:206-215)."""
    import torch.nn as nn

    return nn.Sequential(
        nn.Linear(in_dim, 256), nn.BatchNorm1d(256), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(256, 128), nn.ReLU(), nn.Dropout(0.2),
        nn.Linear(128, 1))


def build_reference_named_simple_fusion(rna_dim=5005, use_monai=True):
    """Reference SimpleFusionModel (simple_fusion.py:160-236): deep RNA
    encoder + CT encoder, cat([rna, img]) -> 3-layer fusion head."""
    import torch
    import torch.nn as nn

    class SimpleFusionModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.rna_encoder = _rna_deep(rna_dim, 256)
            self.image_encoder = (_monai_densenet121_3d(128) if use_monai
                                  else _fallback_cnn(128))
            self.fusion = _fusion_3layer(256 + 128)

        def forward(self, image, rnaseq):
            img = self.image_encoder(image)
            if img.dim() > 2:
                img = img.flatten(1)
            fused = torch.cat([self.rna_encoder(rnaseq), img], 1)
            return self.fusion(fused).squeeze(1)

    return SimpleFusionModel()


def build_reference_named_flexible(rna_dim=5005, use_monai=True):
    """Reference FlexibleMultimodalModel (flexible_multimodal.py:157-256):
    learnable missing-modality biases, cat([img, rna]) -> fusion head."""
    import torch
    import torch.nn as nn

    class FlexibleMultimodalModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = (_monai_densenet121_3d(128) if use_monai
                                  else _fallback_cnn(128))
            self.rna_encoder = _rna_deep(rna_dim, 256)
            self.missing_image_bias = nn.Parameter(torch.randn(128))
            self.missing_rna_bias = nn.Parameter(torch.randn(256))
            self.fusion = _fusion_3layer(128 + 256)

        def forward(self, image, rnaseq, mask):
            img = self.image_encoder(image)
            if img.dim() > 2:
                img = img.flatten(1)
            rna = self.rna_encoder(rnaseq)
            im, rm = mask[:, 0:1], mask[:, 1:2]
            img = img * im + self.missing_image_bias[None, :] * (1 - im)
            rna = rna * rm + self.missing_rna_bias[None, :] * (1 - rm)
            return self.fusion(torch.cat([img, rna], 1)).squeeze(1)

    return FlexibleMultimodalModel()


def build_reference_named_final(rna_dim=5005, clinical_dim=1, use_monai=True):
    """Reference MultiModalSurvivalNet (final_multimodal.py:59-150):
    CT + compact RNA + clinical -> 2-layer fusion -> cox_head."""
    import torch
    import torch.nn as nn

    class MultiModalSurvivalNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.ct_encoder = (_monai_densenet121_3d(128) if use_monai
                               else _fallback_cnn(128))
            self.rna_encoder = nn.Sequential(
                nn.Linear(rna_dim, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.3), nn.Linear(512, 128), nn.ReLU())
            self.clinical_encoder = nn.Sequential(
                nn.Linear(clinical_dim, 32), nn.ReLU())
            self.fusion = nn.Sequential(
                nn.Linear(128 + 128 + 32, 256), nn.BatchNorm1d(256),
                nn.ReLU(), nn.Dropout(0.3),
                nn.Linear(256, 128), nn.ReLU())
            self.cox_head = nn.Linear(128, 1)

        def forward(self, ct, rna, clinical):
            f = self.ct_encoder(ct)
            if f.dim() > 2:
                f = f.flatten(1)
            fused = torch.cat([f, self.rna_encoder(rna),
                               self.clinical_encoder(clinical)], 1)
            return self.cox_head(self.fusion(fused)).squeeze(1)

    return MultiModalSurvivalNet()


def build_reference_named_image_only():
    """Reference ImageOnlyModel (generate_km_curves.py:28-54)."""
    import torch.nn as nn

    class ImageOnlyModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(
                nn.Conv3d(1, 16, 3, stride=2, padding=1),
                nn.BatchNorm3d(16), nn.ReLU(),
                nn.Conv3d(16, 32, 3, stride=2, padding=1),
                nn.BatchNorm3d(32), nn.ReLU(),
                nn.Conv3d(32, 64, 3, stride=2, padding=1),
                nn.BatchNorm3d(64), nn.ReLU(),
                nn.AdaptiveAvgPool3d(1),
            )
            self.fc = nn.Sequential(nn.Linear(64, 32), nn.ReLU())
            self.risk_head = nn.Linear(32, 1)

        def forward(self, x):
            x = self.encoder(x).flatten(1)
            return self.risk_head(self.fc(x)).squeeze(1)

    return ImageOnlyModel()


def build_reference_named_simmlm(rna_dim=5005, clinical_dim=1,
                                 use_monai=True):
    """Reference SimMLM_SurvivalNet (generate_km_curves.py:160-281): three
    ModalityExperts (each with its own cox head on the UNMASKED features),
    masked-softmax gating over [masked features ‖ mask], gate-weighted-sum
    fusion, ensemble cox head."""
    import torch
    import torch.nn as nn

    class ModalityExpert(nn.Module):
        def __init__(self, modality, input_dim=None, output_dim=128):
            super().__init__()
            self.modality = modality
            if modality == "image":
                self.encoder = (_monai_densenet121_3d(output_dim)
                                if use_monai else _fallback_cnn(output_dim))
                self.pool = nn.AdaptiveAvgPool3d(1)
            elif modality == "rnaseq":
                self.encoder = nn.Sequential(
                    nn.Linear(input_dim, 512), nn.BatchNorm1d(512),
                    nn.ReLU(), nn.Dropout(0.3),
                    nn.Linear(512, output_dim), nn.ReLU())
            else:
                self.encoder = nn.Sequential(
                    nn.Linear(input_dim, 64), nn.ReLU(),
                    nn.Linear(64, output_dim), nn.ReLU())
            self.cox_head = nn.Linear(output_dim, 1)

        def forward(self, x):
            feat = self.encoder(x)
            if feat.dim() > 2:
                feat = feat.flatten(1)
            return feat, self.cox_head(feat).squeeze(1)

    class GatingNetwork(nn.Module):
        def __init__(self, feature_dim=128, num=3):
            super().__init__()
            self.gate = nn.Sequential(
                nn.Linear(feature_dim * num + num, 128), nn.ReLU(),
                nn.Dropout(0.2), nn.Linear(128, 64), nn.ReLU(),
                nn.Linear(64, num))

        def forward(self, features_list, mask):
            logits = self.gate(torch.cat(features_list + [mask], 1))
            logits = logits.masked_fill(mask == 0, float("-inf"))
            return torch.softmax(logits, 1)

    class SimMLM_SurvivalNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.expert_image = ModalityExpert("image")
            self.expert_rnaseq = ModalityExpert("rnaseq", input_dim=rna_dim)
            self.expert_clinical = ModalityExpert("clinical",
                                                  input_dim=clinical_dim)
            self.gating = GatingNetwork()
            self.ensemble_cox = nn.Linear(128, 1)

        def forward(self, image, rnaseq, clinical, mask):
            fi, hi = self.expert_image(image)
            fr, hr = self.expert_rnaseq(rnaseq)
            fc, hc = self.expert_clinical(clinical)
            fi = fi * mask[:, 0:1]
            fr = fr * mask[:, 1:2]
            fc = fc * mask[:, 2:3]
            g = self.gating([fi, fr, fc], mask)
            fused = g[:, 0:1] * fi + g[:, 1:2] * fr + g[:, 2:3] * fc
            ensemble = self.ensemble_cox(fused).squeeze(1)
            return ensemble, torch.stack([hi, hr, hc], 1), g

    return SimMLM_SurvivalNet()


def build_reference_named_rnaseq(rna_dim=5005, hidden=(1024, 512, 256)):
    """The reference's RNASeqSurvivalModel with its exact ``mlp`` attribute
    (train_rnaseq_only.py:126-151)."""
    import torch.nn as nn

    class RNASeqSurvivalModel(nn.Module):
        def __init__(self):
            super().__init__()
            layers, in_dim = [], rna_dim
            for h in hidden:
                layers += [nn.Linear(in_dim, h), nn.BatchNorm1d(h),
                           nn.ReLU(), nn.Dropout(0.3)]
                in_dim = h
            layers.append(nn.Linear(in_dim, 1))
            self.mlp = nn.Sequential(*layers)

        def forward(self, x):
            return self.mlp(x)

    return RNASeqSurvivalModel()
