"""DSP kernel library (reference: sdrbase/dsp/)."""
