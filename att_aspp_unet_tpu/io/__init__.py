"""Host-side image IO.

The reference outsourced volume IO to SimpleITK/ITK C++
(``/root/reference/inference.py:147-190``).  This framework ships its own
MetaImage (.mha) codec (``mha.py``; zlib-compressed, header-faithful) plus PNG
and JSON helpers, so the runtime has no dependency on ITK/OpenCV.
"""

from .mha import MetaImage, read_mha, write_mha  # noqa: F401
from .png import read_gray_png, write_gray_png  # noqa: F401
from .json_io import read_json, write_json  # noqa: F401
