from . import (attention, e4e, efficientnet, gac, ghostnet, heads,
               heads_extra, irse, mobilefacenet, mtcnn, psp, resnet,
               stylegan2, stylegan2_ada)
from .e4e import (E4e, LatentCodesDiscriminator, LatentCodesPool,
                  ProgressiveBackboneEncoder)
from .mtcnn import MTCNN
from .psp import GradualStyleEncoder
from .attention import AttentionNet_56, AttentionNet_92, ResidualAttentionNet
from .efficientnet import EfficientNet, EfficientNetB0
from .ghostnet import GhostNet
from .mobilefacenet import MobileFaceNet
from .resnet import ResNet, ResNet_50, ResNet_101, ResNet_152
from .psp import (BackboneEncoder, BackboneEncoderDiffHead,
                  GradualStyleBlock, PSp, PSpFaceRec, n_styles_for)
from .stylegan2 import Discriminator
from .stylegan2 import Generator as GeneratorRosinality
from .heads import (AdaCos, AmSoftmax, ArcFace, CosFace, CurricularFace,
                    HEAD_REGISTRY, SoftmaxHead, SphereFace, build_head)
from .irse import (Backbone, BottleneckIR, IR_50, IR_101, IR_152, IR_SE_50,
                   IR_SE_101, IR_SE_152, SEModule, get_blocks, l2_norm)
from .stylegan2_ada import (FullyConnectedLayer, Generator, MappingNetwork,
                            SynthesisNetwork)

__all__ = [
    "attention", "efficientnet", "ghostnet", "mobilefacenet", "resnet",
    "AttentionNet_56", "AttentionNet_92", "ResidualAttentionNet",
    "EfficientNet", "EfficientNetB0", "GhostNet", "MobileFaceNet",
    "ResNet", "ResNet_50", "ResNet_101", "ResNet_152",
    "heads", "irse", "psp", "stylegan2", "stylegan2_ada", "BackboneEncoder",
    "BackboneEncoderDiffHead", "GradualStyleBlock", "PSp", "PSpFaceRec",
    "n_styles_for", "Discriminator", "GeneratorRosinality",
    "AdaCos", "AmSoftmax", "ArcFace",
    "CosFace", "CurricularFace", "HEAD_REGISTRY", "SoftmaxHead",
    "SphereFace", "build_head", "Backbone", "BottleneckIR", "IR_50",
    "IR_101", "IR_152", "IR_SE_50", "IR_SE_101", "IR_SE_152", "SEModule",
    "get_blocks", "l2_norm", "FullyConnectedLayer", "Generator",
    "MappingNetwork", "SynthesisNetwork",
]
