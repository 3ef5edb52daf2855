"""Registry module for the LBD line matcher
(reference: gluefactory/models/matchers/line_matcher_lbd.py:13-91).
The implementation lives with the descriptor in ``lines/lbd.py``."""

from ..lines.lbd import LineMatcherLBD

__main_model__ = LineMatcherLBD
