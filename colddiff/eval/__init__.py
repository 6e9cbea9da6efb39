from .fid import calculate_fid_given_samples, fid_features_fn, frechet_distance  # noqa: F401
from .gmm import GMM, fit_gmm, sample_gmm  # noqa: F401
from .harness import EvalHarness  # noqa: F401
from .metrics import psnr, rmse, ssim  # noqa: F401
