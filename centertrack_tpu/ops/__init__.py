"""Pure tensor ops: affine geometry, gaussian rendering, decode, losses.

This is the TPU-native analogue of the reference's L1 layer
(reference: src/lib/model/utils.py, src/lib/model/decode.py,
src/lib/model/losses.py, src/lib/utils/image.py).
"""
