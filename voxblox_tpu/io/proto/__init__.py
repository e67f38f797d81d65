import os
import sys

# protoc emits `import voxblox.X_pb2` absolute imports; make the generated
# package resolvable without polluting the global namespace permanently.
_here = os.path.dirname(__file__)
if _here not in sys.path:
    sys.path.insert(0, _here)

from voxblox import Block_pb2, Layer_pb2  # noqa: E402,F401

BlockProto = Block_pb2.BlockProto
LayerProto = Layer_pb2.LayerProto
