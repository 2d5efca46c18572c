from season_nerf_tpu.models.encodings import positional_encode
from season_nerf_tpu.models.siren import SineLayer
from season_nerf_tpu.models.tnerf import TNeRF, GNeRF
