from .anchors import (MlvlPointGenerator, PseudoAnchorGenerator,
                      RotatedAnchorGenerator, anchor_inside_flags)
from .assigners import (AssignResult, ATSSObbAssigner, MaxIoUAssigner,
                        PseudoSampler, RRandomSampler, SamplingResult)
from .coders import (CSLCoder, DeltaXYWHAHBBoxCoder, DeltaXYWHAOBBoxCoder,
                     DistanceAnglePointCoder, GVFixCoder, GVRatioCoder,
                     MidpointOffsetCoder)

__all__ = [
    'RotatedAnchorGenerator', 'PseudoAnchorGenerator', 'MlvlPointGenerator',
    'anchor_inside_flags', 'MaxIoUAssigner', 'ATSSObbAssigner',
    'PseudoSampler', 'RRandomSampler', 'AssignResult', 'SamplingResult',
    'DeltaXYWHAOBBoxCoder', 'DeltaXYWHAHBBoxCoder', 'MidpointOffsetCoder',
    'DistanceAnglePointCoder', 'GVFixCoder', 'GVRatioCoder', 'CSLCoder',
]
