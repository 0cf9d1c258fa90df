"""Version of the custereomatching_tpu package.

Parity note: mirrors the reference's single-constant version module
(reference: custma/version.py:1, version "0.0.1").
"""

__version__ = "0.2.0"
