"""Independent NumPy/scipy oracle for skimage's PSNR/SSIM algorithms.

skimage itself is not installed in this image, so tests validate
``midd_tpu.train.metrics`` against this implementation of the published
algorithm (Wang et al. 2004 as implemented by scikit-image defaults:
7x7 uniform window, K1=0.01, K2=0.03, sample covariance, edge crop).
"""

import numpy as np
from scipy.ndimage import uniform_filter


def peak_signal_noise_ratio(image_true, image_test, data_range=1.0):
    err = np.mean((np.asarray(image_true, np.float64) - np.asarray(image_test, np.float64)) ** 2)
    return 10.0 * np.log10((data_range**2) / err)


def structural_similarity(im1, im2, data_range=1.0, win_size=7, K1=0.01, K2=0.03):
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    NP = win_size**2
    cov_norm = NP / (NP - 1)

    filt = lambda im: uniform_filter(im, size=win_size)  # mode='reflect' default
    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()
