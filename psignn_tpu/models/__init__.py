"""Model families: psignn (DEQ), dsgps (gated recurrent), dss (feed-forward).

Each family exists for Dirichlet and mixed Dirichlet+Neumann boundary
conditions via a ``bc_mode`` flag instead of the reference's six copied
model files (SURVEY.md §1 duplication note).
"""

from .psignn import (PsignnConfig, psignn_init, psignn_forward,
                     psignn_forward_stacked, psignn_inference,
                     psignn_iterative_inference)
from .dsgps import DsgpsConfig, dsgps_init, dsgps_forward, dsgps_inference
from .dss import DssConfig, dss_init, dss_forward, dss_inference
