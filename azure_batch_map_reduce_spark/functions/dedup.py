"""(stub — filled in a later milestone)"""
