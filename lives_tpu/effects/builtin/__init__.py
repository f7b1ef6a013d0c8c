"""Builtin effect library — registers on import.

TPU-native re-expressions of the reference's core weed plugins
(`/root/reference/lives-plugins/weed-plugins/`); see each module's docstring
for the specific plugins covered.
"""

from . import (alpha, analysers, blends, blur, colour,  # noqa: F401
               dataplugins, effectv, extra, generators, geometry, keying,
               puretext)
from ..compound import register_builtin_compounds
from ..milkdrop import register_builtin_presets
from ...io import kinect  # noqa: F401  (registers `depth_key`; gated hw)

register_builtin_compounds()
register_builtin_presets()
