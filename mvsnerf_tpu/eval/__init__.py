from .metrics import psnr, mse2psnr, img2mse, ssim, abs_error, acc_threshold
