"""Signal-chain models: the OFDM modulator (TX), the streaming OFDM
demodulator (RX front-end, the flagship compute model), and the full DAB
receiver pipeline."""

from .modulator import OFDMModulator
from .demodulator import OFDMDemodulator, DemodConfig, DemodCarry
