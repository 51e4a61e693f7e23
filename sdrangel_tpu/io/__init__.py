"""File and stream I/O (reference: filerecord/filesource, audio, testsource)."""
