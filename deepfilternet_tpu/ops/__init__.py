from deepfilternet_tpu.ops.erb import (  # noqa: F401
    erb2freq,
    erb_fb_matrices,
    erb_widths,
    freq2erb,
)
from deepfilternet_tpu.ops.stft import (  # noqa: F401
    Stft,
    istft,
    stft,
    vorbis_window,
)
from deepfilternet_tpu.ops.norms import (  # noqa: F401
    MEAN_NORM_INIT,
    UNIT_NORM_INIT,
    erb_norm,
    get_norm_alpha,
    mean_norm_init,
    unit_norm,
    unit_norm_init,
)
from deepfilternet_tpu.ops.features import erb_feat, spec_feat  # noqa: F401
from deepfilternet_tpu.ops.df_op import deep_filter, deep_filter_offline  # noqa: F401
from deepfilternet_tpu.ops.postfilter import post_filter  # noqa: F401
