"""JAX/Pallas compute ops for the DAB pipeline.

Numeric kernels (batched, static-shape, jit-friendly): PLL mixing, OFDM sync
correlators, frame demodulation, punctured Viterbi decode, energy-dispersal
descrambling, Reed-Solomon, and time deinterleaving. Host-side byte-level
helpers (CRC) live here too as NumPy.
"""
