#!/bin/bash
# Run the test suite on CPU, bypassing axon TPU registration (which can
# block interpreter startup when the TPU grant is wedged — see
# .claude/skills/verify/SKILL.md).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "${@:-tests/}" -q
