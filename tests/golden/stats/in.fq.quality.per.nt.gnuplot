set output '<OUTDIR>/in.fq.quality.per.nt.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'Quality (Phred33 scale)'
set xlabel 'Nucleotide position'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'Quality per Nucleotide Position'
set xrange [ 0 : 59 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot '<OUTDIR>/in.fq.quality.per.nt.data' using 1:2 title '' with lines
