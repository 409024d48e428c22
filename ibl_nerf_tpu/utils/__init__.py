"""Framework utilities: logging, timing, image I/O, weight porting."""
