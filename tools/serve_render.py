#!/usr/bin/env python
"""Serve a trained model directory as an HTTP render service.

  python tools/serve_render.py --Model_Location ./io/Logs/demo --port 8642

Endpoints (see season_nerf_tpu/render/serving.py):
  /healthz  /info  /render?view_el=&view_az=&sun_el=&sun_az=&t=&size=&layer=
  /dsm?size=&format=npy|png
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from season_nerf_tpu.render.serving import main  # noqa: E402

if __name__ == "__main__":
    main()
