"""CLI applications mirroring the reference executables' stdin/stdout byte
contracts (examples/README.md): u8 (and 13 other formats) IQ streams, int8
soft-bit frames, 8x-packed hard bits — so the reference's shell-pipeline
topologies compose unchanged."""
