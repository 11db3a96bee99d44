#!/bin/bash
# Run python on CPU without the axon remote-compile hook (for debugging).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python "$@"
