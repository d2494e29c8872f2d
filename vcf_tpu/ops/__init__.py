"""Device-side (jittable) pixel math: transforms, quantizers, motion."""
